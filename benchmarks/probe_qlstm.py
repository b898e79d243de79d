#!/usr/bin/env python
"""QLSTM recurrence probe: XLA in-scan paths vs the scan-resident Pallas
kernel, plus the component itemization behind the config-4 attainable table
(docs/performance.md).

Measures ONE mid-stack QBiLSTM layer at config-4 shapes (cin = 2H so the
layer chains shape-preserving): fwd and fwd+bwd per recurrence variant, and
the pre-scan input projection alone (the subtraction isolates the scan).

  python benchmarks/probe_qlstm.py [--b 8] [--t 512] [--h 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--cin", type=int, default=0,
                    help="quaternion input channels (default 2*h = mid-stack)")
    ap.add_argument("--variants", default="fast8,pallas8,block")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/qasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from qasr.models.qlstm import QBiLSTM
    from qasr.utils.profiling import steady_state_times

    b, t, h = args.b, args.t, args.h
    # default mid-stack layer: input = previous biQLSTM output (chains);
    # --cin 1664 probes config-4's first layer (conv front-end F*C)
    cin = args.cin or 2 * h
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, 4 * cin).astype(np.float32)).astype(dtype)
    lengths = jnp.asarray(np.full((b,), t, np.int32))

    def make_inproj_arm(grad):
        """Pre-scan input projection alone (both directions' gate GEMM +
        bias + scan-layout stack) — subtracting this from a layer arm
        isolates the recurrence."""
        from qasr.ops.qlinalg import qdense_fast8

        wx = jnp.asarray(rng.randn(4, cin, 8 * h).astype(np.float32) * 0.02).astype(dtype)
        bias = jnp.zeros((2, 16 * h), dtype)

        def proj(wx_, xx):
            z = qdense_fast8(xx.reshape(b * t, 4 * cin), wx_)
            z = z.reshape(b, t, 2, 16 * h) + bias
            xs = jnp.stack(
                [jnp.moveaxis(z[:, :, 0], 1, 0),
                 jnp.moveaxis(z[:, :, 1], 1, 0)[::-1]], axis=1
            )
            return xs

        if grad:
            gfn = jax.value_and_grad(
                lambda w_, xx: jnp.sum(proj(w_, xx).astype(jnp.float32) ** 2)
            )

            @jax.jit
            def chain(w_, xx, n):
                def body(_, carry):
                    ww, acc = carry
                    val, g = gfn(ww, xx)
                    return ww - 1e-9 * g.astype(ww.dtype), acc + val

                _, acc = jax.lax.fori_loop(0, n, body, (w_, jnp.float32(0)))
                return acc
        else:
            @jax.jit
            def chain(w_, xx, n):
                def body(_, carry):
                    ww, acc = carry
                    y = proj(ww, xx)
                    s = jnp.sum(y[0, 0, 0].astype(jnp.float32))
                    # thread a data dependency so the loop body is not
                    # hoisted as loop-invariant
                    return ww + (s * 1e-30).astype(ww.dtype), acc + s

                _, acc = jax.lax.fori_loop(0, n, body, (w_, jnp.float32(0)))
                return acc

        float(chain(wx, x, 1))
        return lambda n: (lambda s: (float(chain(wx, x, n)), time.perf_counter() - s)[1])(
            time.perf_counter()
        )

    def make_arm(variant, grad):
        layer = QBiLSTM(h, dtype=dtype, recurrent=variant)
        params = layer.init(jax.random.PRNGKey(0), x, lengths)

        if grad:
            def loss(p, xx):
                return jnp.sum(layer.apply(p, xx, lengths).astype(jnp.float32) ** 2)

            gfn = jax.value_and_grad(loss)

            @jax.jit
            def chain(p, xx, n):
                def body(_, carry):
                    pp, acc = carry
                    val, g = gfn(pp, xx)
                    pp = jax.tree.map(lambda a, d: a - 1e-9 * d.astype(a.dtype), pp, g)
                    return pp, acc + val

                _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
                return acc
        elif cin == 2 * h:
            @jax.jit
            def chain(p, xx, n):
                def body(_, carry):
                    xx_, acc = carry
                    y = layer.apply(p, xx_, lengths)
                    return y.astype(dtype), acc + jnp.sum(y[0, 0].astype(jnp.float32))

                _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
                return acc
        else:
            # non-chaining shape: thread the dependency through the params
            @jax.jit
            def chain(p, xx, n):
                def body(_, carry):
                    pp, acc = carry
                    y = layer.apply(pp, xx, lengths)
                    s = jnp.sum(y[0, 0].astype(jnp.float32))
                    pp = jax.tree.map(
                        lambda a: a + (s * 1e-30).astype(a.dtype), pp
                    )
                    return pp, acc + s

                _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
                return acc

        t0 = time.perf_counter()
        float(chain(params, x, 1))
        print(f"  compiled {variant} grad={grad} in {time.perf_counter()-t0:.1f}s",
              flush=True)
        return lambda n: (lambda s: (float(chain(params, x, n)), time.perf_counter() - s)[1])(
            time.perf_counter()
        )

    variants = args.variants.split(",")
    arms = {}
    for v in variants:
        if v == "inproj":
            arms["inproj_fwd"] = (make_inproj_arm(False), (2, 10))
            if not args.fwd_only:
                arms["inproj_step"] = (make_inproj_arm(True), (2, 10))
            continue
        arms[f"{v}_fwd"] = (make_arm(v, False), (2, 10))
        if not args.fwd_only:
            arms[f"{v}_step"] = (make_arm(v, True), (2, 10))

    times = steady_state_times(arms, repeats=args.repeats)
    print(f"\nQBiLSTM layer B={b} T={t} H={h} cin={cin} bf16 (ms):")
    for k, v in sorted(times.items()):
        print(f"  {k:>16}: {v*1e3:8.2f}")

    # attainable inputs for the accounting table
    w_bytes = 2 * 8 * h * 4 * h * 2  # resident rank-8 weights, bf16
    xz_bytes = t * 2 * b * 16 * h * 2
    out_bytes = t * 2 * b * (4 * h * 2 + 16 * h) * 2  # hs+cs+gates
    mxu_flops = 2 * 8 * t * 2 * b * h * 4 * h
    print(
        f"\n  per-layer: resident W {w_bytes/1e6:.1f} MB | per-scan-step "
        f"stream {(xz_bytes+out_bytes)/t/1e3:.0f} KB | scan MXU "
        f"{mxu_flops/1e9:.1f} GFLOP at M={b} rows/dot | XLA per-step weight "
        f"re-read {w_bytes/1e6:.1f} MB x {t} steps = {w_bytes*t/1e9:.1f} GB "
        f"(~{w_bytes*t/819e9*1e3:.1f} ms at 819 GB/s HBM)"
    )


if __name__ == "__main__":
    main()
