#!/usr/bin/env python
"""Micro-probe: fused Pallas conv kernel vs the XLA paths, fwd and fwd+bwd.

Times one conv op at a given shape for each arm using the interleaved
difference-quotient harness (qasr.utils.profiling.steady_state_times).

Usage: python benchmarks/probe_fused.py [--cin 256] [--cout 256] [--grad]
       [--arms fast10,fast8_st,ft8_st,block] [--grad-wrt x|w]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--f", type=int, default=13)
    ap.add_argument("--cin", type=int, default=256)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--grad", action="store_true")
    ap.add_argument(
        "--grad-wrt",
        default="",
        choices=["", "x", "w"],
        help="time fwd+only-this-gradient (dx or dW isolation: subtract the "
        "fwd-only time of the same arm)",
    )
    ap.add_argument("--arms", default="fast10,fast8_st,ft8_st")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-small", type=int, default=5)
    ap.add_argument("--n-big", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qasr.ops.qlinalg import qconv, qconv_fast10
    from qasr.ops.pallas import qconv2d_pallas
    from qasr.ops.pallas.qconv_ft import (
        pack_to_stacked,
        qconv2d_ft,
        qconv2d_ft8_stacked,
        qconv2d_ft_stacked,
        qconv_fast8_stacked,
        qconv_fast10_stacked,
    )
    from qasr.utils.profiling import steady_state_times, qconv_flops, CHIPS

    ops = {
        "block": qconv,
        "fast10": qconv_fast10,
        "im2col": qconv2d_pallas,
        # F-major fused kernel: carries the chain in [B, F, T, 4C] layout
        "ft": qconv2d_ft,
        # stacked layout [B, 4, F, T, C] end to end — the model-integration
        # steady state (no per-layer repacking)
        "ft_st": qconv2d_ft_stacked,
        "fast10_st": qconv_fast10_stacked,
        # rank-8 scheme (quaternion.py U8/V8/O8): 8 MXU products
        "ft8_st": qconv2d_ft8_stacked,
        "fast8_st": qconv_fast8_stacked,
    }
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (args.batch, args.t, args.f, 4 * args.cin), dt)
    w = jax.random.normal(kw, (4, 3, 3, args.cin, args.cout), dt) * 0.05

    x_ft = jnp.swapaxes(x, 1, 2)
    x_st = jax.jit(pack_to_stacked)(x_ft)

    def make_chain(op, arm):
        x_arm = {
            "ft": x_ft,
            "ft_st": x_st,
            "fast10_st": x_st,
            "ft8_st": x_st,
            "fast8_st": x_st,
        }.get(arm, x)
        if args.grad_wrt:
            argnum = 0 if args.grad_wrt == "x" else 1

            def loss(x, w):
                return jnp.sum(op(x, w).astype(jnp.float32) ** 2) * 1e-6

            step = jax.value_and_grad(loss, argnums=argnum)

            @functools.partial(jax.jit, static_argnames=("n",))
            def chain(x, w, n):
                def body(_, carry):
                    x, w = carry
                    l, g = step(x, w)
                    if argnum == 0:
                        return (x + 1e-12 * g, w)
                    return (x, w + 1e-12 * g)

                x, w = jax.lax.fori_loop(0, n, body, (x, w))
                # sum BOTH carries: returning only x would let XLA dead-code
                # the whole loop in the wrt-w mode (x never changes there)
                return jnp.sum(x[..., :1].astype(jnp.float32)) + jnp.sum(
                    w[..., :1].astype(jnp.float32)
                )
        elif args.grad:
            def loss(x, w):
                return jnp.sum(op(x, w).astype(jnp.float32) ** 2) * 1e-6

            step = jax.value_and_grad(loss, argnums=(0, 1))

            @functools.partial(jax.jit, static_argnames=("n",))
            def chain(x, w, n):
                def body(_, carry):
                    x, w = carry
                    l, (gx, gw) = step(x, w)
                    return (x + 1e-12 * gx, w + 1e-12 * gw)

                x, w = jax.lax.fori_loop(0, n, body, (x, w))
                return jnp.sum(x[..., :1].astype(jnp.float32))
        else:
            @functools.partial(jax.jit, static_argnames=("n",))
            def chain(x, w, n):
                def body(_, c):
                    y = op(c, w)
                    s = jax.lax.rsqrt(
                        jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                    ).astype(y.dtype)
                    return y * s

                y = jax.lax.fori_loop(0, n, body, x)
                return jnp.sum(y[..., :1].astype(jnp.float32))

        def run(n):
            v = float(chain(x_arm, w, n))
            assert v == v, "non-finite"
            t0 = time.perf_counter()
            float(chain(x_arm, w, n))
            return time.perf_counter() - t0

        return run

    arms = [a for a in args.arms.split(",") if a]
    runs = {}
    for a in arms:
        t0 = time.perf_counter()
        r = make_chain(ops[a], a)
        r(args.n_small)  # compile now so timing below is clean
        runs[a] = r
        print(f"# {a}: compiled in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    times = steady_state_times(
        runs, n_small=args.n_small, n_big=args.n_big, repeats=args.repeats
    )
    flops = qconv_flops(args.batch, args.t, args.f, args.cin, args.cout)
    # passes measured: fwd+dx+dW (grad), fwd+one-gradient (grad_wrt), or fwd
    scale = 3 if args.grad else (2 if args.grad_wrt else 1)
    out = {"shape": f"B{args.batch} T{args.t} F{args.f} C{args.cin}->{args.cout}",
           "grad": args.grad, "grad_wrt": args.grad_wrt}
    for a in arms:
        out[a + "_s"] = round(times[a], 6)
        out[a + "_eff_tflops"] = round(scale * flops / times[a] / 1e12, 1)
    base = arms[0]
    for a in arms[1:]:
        out[f"{a}_vs_{base}"] = round(times[base] / times[a], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
