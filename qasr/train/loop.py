"""Training driver: the L5 experiment loop (SURVEY.md §2a C11, §3.1).

Epoch-less step loop over bucketed batches with periodic eval (greedy dev
PER), Orbax checkpointing, and structured metrics incl. audio-seconds/s/chip.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from qasr.configs import Config
from qasr.data.batching import epoch_iterator
from qasr.data.synthetic import SyntheticDataset
from qasr.decode.scoring import batch_per
from qasr.train.checkpoint import CheckpointManager
from qasr.train.metrics import MetricWriter
from qasr.train.state import create_train_state, param_count
from qasr.train.step import make_eval_step, make_train_step


def build_dataset(cfg: Config, *, seed: int = 0):
    d = cfg.data
    if d.dataset == "synthetic":
        return SyntheticDataset(
            vocab=cfg.model.vocab,
            n_mels=d.n_mels,
            num_examples=d.num_synthetic,
            seed=seed,
        )
    if d.dataset == "timit":
        from qasr.data.pipeline import TimitFeaturePipeline

        return TimitFeaturePipeline(cfg, split="train")
    raise ValueError(f"unsupported dataset {d.dataset!r} in this environment")


def _batch_stream(dataset, cfg: Config, seed: int):
    epoch = 0
    while True:
        yield from epoch_iterator(dataset, cfg.data, seed=seed + epoch, train=True)
        epoch += 1


def train(cfg: Config, *, metrics_dir: str | None = None, resume: bool = False):
    """Run training to cfg.train.num_steps. Returns (state, last_metrics)."""
    rng = jax.random.PRNGKey(cfg.train.seed)
    dataset = build_dataset(cfg, seed=cfg.train.seed)
    stream = _batch_stream(dataset, cfg, cfg.train.seed)
    first = next(stream)

    state = create_train_state(cfg, rng, first["features"])
    ckpt = CheckpointManager(cfg)
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(ckpt.latest_step(), state)
        print(f"[qasr] resumed from step {int(state.step)}")

    train_step = make_train_step(cfg)
    eval_step = make_eval_step(cfg)
    writer = MetricWriter(metrics_dir or cfg.train.checkpoint_dir)
    n_chips = jax.device_count()
    frame_s = 0.010  # hop 10 ms -> 1 frame = 10 ms of audio

    print(f"[qasr] config={cfg.name} params={param_count(state.params):,} "
          f"devices={n_chips}")

    batch = first
    last_metrics = {}
    t_window = time.perf_counter()
    frames_window = 0
    start_step = int(state.step)
    for step in range(start_step, cfg.train.num_steps):
        state, m = train_step(state, batch)
        frames_window += int(m["frames"])
        if (step + 1) % cfg.train.log_every == 0:
            now = time.perf_counter()
            audio_s_per_s = frames_window * frame_s / max(now - t_window, 1e-9)
            last_metrics = {
                "loss": float(m["loss"]),
                "grad_norm": float(m["grad_norm"]),
                "audio_s_per_s_per_chip": audio_s_per_s / n_chips,
            }
            writer.write(step + 1, last_metrics)
            t_window, frames_window = now, 0
        if (step + 1) % cfg.train.eval_every == 0:
            dev = evaluate(cfg, state.params, dataset, eval_step)
            writer.write(step + 1, {"dev_" + k: v for k, v in dev.items()})
            ckpt.save(step + 1, state, dev_per=dev.get("per"))
        elif (step + 1) % cfg.train.checkpoint_every == 0:
            ckpt.save(step + 1, state)
        batch = next(stream)

    ckpt.wait()
    writer.close()
    return state, last_metrics


def evaluate(cfg: Config, params, dataset, eval_step, *, beam: bool = False) -> dict:
    """PER over one pass of the dataset: greedy (dev protocol) or prefix
    beam search (final numbers; SURVEY.md §3.4)."""
    from qasr.decode.beam import ctc_beam_search_decode
    from qasr.train.state import build_model

    model = build_model(cfg) if beam else None
    errs = total = 0
    losses = []
    for batch in epoch_iterator(dataset, cfg.data, train=False):
        out = eval_step(params, batch)
        if beam:
            logits = model.apply(
                {"params": params}, batch["features"], train=False
            )
            seq, lens, _ = ctc_beam_search_decode(
                logits,
                batch["feature_lengths"],
                beam_width=cfg.decode.beam_width,
                blank_id=cfg.decode.blank_id,
                max_len=int(cfg.data.max_label_len),
            )
            out = dict(out)
            out["decoded"], out["decoded_lengths"] = seq, lens
        losses.append(float(out["loss"]))
        e, n = batch_per(
            batch["labels"],
            batch["label_lengths"],
            np.asarray(out["decoded"]),
            np.asarray(out["decoded_lengths"]),
            fold=cfg.data.dataset == "timit",
        )
        errs += e
        total += n
    return {
        "loss": float(np.mean(losses)) if losses else float("nan"),
        "per": errs / max(total, 1),
    }
