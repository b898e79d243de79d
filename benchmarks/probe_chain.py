#!/usr/bin/env python
"""Per-pass timing of the 9-layer fat conv tower: chain-resident Pallas vs
the XLA stacked8 production path.

Arms time ONLY the tower (conv + bias + PReLU x 9, flagship C=256), so the
difference is attributable to the conv path, not CTC/dense/Adam. Passes:
  fwd        — tower forward
  gx         — forward + grad wrt the input (fwd kernels + dx kernels)
  gw         — forward + grad wrt weights (fwd + dx + dW, no dalpha use)
  full       — grads wrt everything (the train-step shape)

Usage: python benchmarks/probe_chain.py [--layers 9] [--c 256] [--mode all]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--f", type=int, default=13)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--arms", default="stacked8,fusedchain8",
        help="comma list from: stacked8,fusedchain8",
    )
    ap.add_argument(
        "--passes", default="fwd,gx,full", help="comma list from: fwd,gx,full"
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/qasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from qasr.ops.pallas import qconv_chain
    from qasr.ops.pallas.qconv_ft import qconv_fast8_stacked
    from qasr.utils.profiling import steady_state_times

    b, t, f, c, L = args.b, args.t, args.f, args.c, args.layers
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 2 + 3 * L)
    x = jax.random.normal(ks[0], (b, 4, f, t, c), dt) * 0.5
    ws = [jax.random.normal(ks[2 + 3*i], (4, 3, 3, c, c), dt) * 0.05 for i in range(L)]
    bs = [jax.random.normal(ks[3 + 3*i], (4 * c,), dt) * 0.1 for i in range(L)]
    als = [
        jnp.abs(jax.random.normal(ks[4 + 3*i], (4 * c,), dt)) * 0.25
        for i in range(L)
    ]

    def tower_stacked(x, ws, bs, als):
        y = x
        for i in range(L):
            y = qconv_fast8_stacked(y, ws[i]) + bs[i].reshape(4, 1, 1, c)
            a = als[i].reshape(4, 1, 1, c)
            y = jnp.where(y >= 0, y, a * y)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def tower_chain(x, ws, bs, als):
        xp = qconv_chain.chain_entry(x, 3)
        prev = None
        for i in range(L):
            xp = qconv_chain.chain_layer(xp, ws[i], bs[i], prev, t_valid=t)
            prev = als[i]
        y = qconv_chain.chain_exit(xp, f, t, 3)
        a = prev.reshape(4, 1, 1, c)
        y = jnp.where(y >= 0, y, a * y)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    towers = {"stacked8": tower_stacked, "fusedchain8": tower_chain}

    def make_step(tower, mode):
        if mode == "fwd":
            def stepfn(x, ws, bs, als):
                return tower(x, ws, bs, als)
        elif mode == "gx":
            def stepfn(x, ws, bs, als):
                g = jax.grad(tower, argnums=0)(x, ws, bs, als)
                return jnp.sum(g.astype(jnp.float32) ** 2)
        else:  # full
            def stepfn(x, ws, bs, als):
                g = jax.grad(tower, argnums=(0, 1, 2, 3))(x, ws, bs, als)
                return sum(
                    jnp.sum(l.astype(jnp.float32) ** 2)
                    for l in jax.tree_util.tree_leaves(g)
                )

        @jax.jit
        def chain(x, ws, bs, als, n):
            def body(_, carry):
                s, xx = carry
                s = s + stepfn(xx, ws, bs, als) * 1e-9
                # scalar feedback keeps the body loop-variant (else XLA
                # hoists it and the difference quotient measures nothing)
                return s, xx * (1.0 + s * 1e-30).astype(xx.dtype)

            s, _ = lax.fori_loop(0, n, body, (jnp.float32(0), x))
            return s

        float(chain(x, ws, bs, als, 1))

        def timed(n):
            t0 = time.perf_counter()
            float(chain(x, ws, bs, als, n))
            return time.perf_counter() - t0

        return timed

    out = {}
    for mode in args.passes.split(","):
        timed = {
            name: (make_step(fn, mode), (2, 10))
            for name, fn in towers.items()
            if name in args.arms.split(",")
        }
        times = steady_state_times(timed, repeats=args.repeats)
        out[mode] = {k: round(v * 1e3, 2) for k, v in times.items()}
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
