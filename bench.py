#!/usr/bin/env python
"""qasr headline benchmark — one JSON line for the driver.

Metric: training throughput in audio-seconds/s/chip on the flagship TIMIT
QCNN (BASELINE.json north-star metric). vs_baseline compares against the
*reference's computation strategy* — the equal-feature-map real CNN whose
conv FLOPs equal the 4x-expanded block conv the reference executes every step
(SURVEY.md §3.2, BASELINE.json config 3) — identical harness, same hardware.

Measurement method: the axon TPU tunnel absorbs ~10-20 queued steps before
wall-clock reflects device time, and the pool shows cross-process drift, so a
single timed loop is unreliable. We therefore time two chained runs of
different lengths and use the difference quotient
    dt = (T(n_big) - T(n_small)) / (n_big - n_small)
which cancels queue-fill/launch transients, repeat it with the two model arms
interleaved (ABAB) to decorrelate drift, and take medians.
"""

from __future__ import annotations

import json
import statistics
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


class _Arm:
    """One model configuration under test: compiled step + fresh-state maker."""

    def __init__(self, cfg, batch):
        import jax

        from qasr.train import create_train_state, make_train_step

        self._jax = jax
        self.cfg = cfg
        self.batch = batch
        self.state = create_train_state(cfg, jax.random.PRNGKey(0), batch["features"])
        self.step = make_train_step(cfg)

    def run_chained(self, n) -> float:
        """Run n chained steps, fully synced at both ends; return seconds."""
        jax = self._jax
        state = self.state
        # sync before
        state, m = self.step(state, self.batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = self.step(state, self.batch)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        self.state = state
        return dt


def bench_arms(arms: dict, *, n_small=5, n_big=25, repeats=5) -> dict:
    """Difference-quotient step time per arm, interleaved repeats, medians."""
    est = {k: [] for k in arms}
    for _ in range(repeats):
        for name, arm in arms.items():
            t_small = arm.run_chained(n_small)
            t_big = arm.run_chained(n_big)
            est[name].append((t_big - t_small) / (n_big - n_small))
    return {k: statistics.median(v) for k, v in est.items()}


def main():
    import jax

    from qasr.configs import get_config

    b, t, f = 16, 256, 40
    frame_s = 0.010
    base = get_config("timit_qcnn").override(
        **{"train.num_steps": 100, "data.batch_size": b}
    )
    batch = _make_batch(b, t, f, base.model.vocab, 48)

    arms = {
        "qcnn": _Arm(base, batch),
        "real_cnn": _Arm(base.override(**{"model.arch": "real_cnn"}), batch),
    }
    times = bench_arms(arms)

    n_chips = jax.device_count()
    audio_s = b * t * frame_s
    ours = audio_s / times["qcnn"] / n_chips
    baseline = audio_s / times["real_cnn"] / n_chips
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
