#!/usr/bin/env python
"""qasr headline benchmark — one JSON line for the driver.

Metric: training throughput in audio-seconds/s/chip on the flagship TIMIT
QCNN (BASELINE.json north-star metric). vs_baseline compares against the
*reference's computation strategy* — the equal-feature-map real CNN whose
conv FLOPs equal the 4x-expanded block conv the reference executes every
step (SURVEY.md §3.2, BASELINE.json config 3) — run through the identical
harness on the same hardware. vs_baseline > 1 means the quaternion model
trains faster than the reference-equivalent compute.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _make_batch(b, t, f, vocab, max_l, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "features": rng.randn(b, t, f, 4).astype(np.float32),
        "feature_lengths": np.full((b,), t, np.int32),
        "labels": rng.randint(1, vocab, size=(b, max_l)).astype(np.int32),
        "label_lengths": np.full((b,), max_l, np.int32),
    }


def bench_arch(cfg, batch, *, warmup=3, iters=20):
    import jax

    from qasr.train import create_train_state, make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0), batch["features"])
    step = make_train_step(cfg)
    for _ in range(warmup):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax

    from qasr.configs import get_config

    b, t, f = 16, 256, 40
    frame_s = 0.010
    base = get_config("timit_qcnn").override(
        **{
            "train.num_steps": 100,
            "data.batch_size": b,
        }
    )
    batch = _make_batch(b, t, f, base.model.vocab, 48)

    dt_q = bench_arch(base, batch)
    dt_r = bench_arch(
        base.override(**{"model.arch": "real_cnn"}), batch
    )

    n_chips = jax.device_count()
    audio_s = b * t * frame_s
    ours = audio_s / dt_q / n_chips
    baseline = audio_s / dt_r / n_chips
    print(
        json.dumps(
            {
                "metric": "train_throughput_timit_qcnn",
                "value": round(ours, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(ours / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
