#!/usr/bin/env python
"""Config-5 (librispeech_large) per-chip HBM envelope, measured by AOT
compilation — no training run needed (round-5 verdict task: the first real
LibriSpeech run must not be the first time anyone learns whether the
preset fits).

For each (per-chip batch, bucket T) point, AOT-compiles the full train
step (fwd + CTC + Adam, donated state) with and without
``train.remat_convs`` and reports XLA's compiled memory stats: arguments
(params + opt state + batch) and temporaries (activations/workspace).
Peak per-chip HBM ~ args + temps; v5e has 16 GB.

  python tools/memory_envelope.py [--preset librispeech_large]
      [--points 8:512,8:1024,16:512,...] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_point(cfg, b, t, remat):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qasr.train.state import build_model, build_optimizer, create_train_state
    from qasr.train.step import make_train_step

    cfg = cfg.override(
        **{
            "data.batch_size": b,
            "data.bucket_sizes": f"({t},)",
            "train.remat_convs": remat,
        }
    )
    n_mels = cfg.data.n_mels
    feats = jax.ShapeDtypeStruct((b, t, n_mels, 4), jnp.float32)
    batch = {
        "features": feats,
        "feature_lengths": jax.ShapeDtypeStruct((b,), jnp.int32),
        "labels": jax.ShapeDtypeStruct(
            (b, cfg.data.max_label_len), jnp.int32
        ),
        "label_lengths": jax.ShapeDtypeStruct((b,), jnp.int32),
    }
    state_shape = jax.eval_shape(
        lambda rng, f: create_train_state(cfg, rng, f),
        jax.random.PRNGKey(0),
        feats,
    )
    step = make_train_step(cfg)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state_shape, batch
    ).compile()
    ma = compiled.memory_analysis()
    return {
        "args_gb": ma.argument_size_in_bytes / 1e9,
        "temp_gb": ma.temp_size_in_bytes / 1e9,
        "total_gb": (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="librispeech_large")
    ap.add_argument(
        "--points",
        default="4:2048,8:2048,16:2048,16:1024,32:1024,64:512,64:2048",
        help="comma list of per-chip batch:bucketT points",
    )
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    ap.add_argument("--as-json", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/qasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from qasr.configs import get_config

    cfg = get_config(args.preset)
    rows = []
    for point in args.points.split(","):
        b, t = (int(v) for v in point.split(":"))
        for remat in (False, True):
            try:
                r = measure_point(cfg, b, t, remat)
                r.update(b=b, t=t, remat=remat,
                         fits=r["total_gb"] < args.hbm_gb * 0.95)
            except Exception as e:  # compile-time OOM raises
                r = {"b": b, "t": t, "remat": remat, "error": str(e)[:120]}
            rows.append(r)
            if not args.as_json:
                if "error" in r:
                    print(f"B{b} T{t} remat={int(remat)}: ERROR {r['error']}")
                else:
                    print(
                        f"B{b} T{t} remat={int(remat)}: args "
                        f"{r['args_gb']:.2f} GB + temps {r['temp_gb']:.2f} GB"
                        f" = {r['total_gb']:.2f} GB"
                        f" {'FITS' if r['fits'] else 'OOM'}"
                        f" (of {args.hbm_gb:.0f} GB)"
                    , flush=True)
    if args.as_json:
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
