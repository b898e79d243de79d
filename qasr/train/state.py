"""Train state construction: model, optimizer, LR schedule.

Reference capability: Adam + fixed hyperparameters in the Keras train script
(SURVEY.md §2a C11; mount empty). Here: optax adamw with warmup+cosine
schedule, global-norm clipping, and a single pytree TrainState that Orbax
checkpoints in full (params, opt state, step, PRNG key) — SURVEY.md §5
checkpoint/resume plan.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from qasr.configs import Config
from qasr.models.qcnn import QCNNEncoder, RealCNNEncoder


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    dropout_rng: jax.Array

    def apply_gradients(self, grads, tx):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            dropout_rng=jax.random.fold_in(self.dropout_rng, self.step),
        )


def build_model(cfg: Config) -> nn.Module:
    m = cfg.model
    dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
    if m.arch == "qcnn":
        return QCNNEncoder(
            conv_features=tuple(m.conv_features),
            dense_features=tuple(m.dense_features),
            vocab=m.vocab,
            kernel_size=tuple(m.kernel_size),
            pool_after=m.pool_after,
            pool_size=m.pool_size,
            dropout_rate=m.dropout_rate,
            dtype=dtype,
            use_pallas=m.use_pallas,
            variant=m.op_variant,
            dense_variant=m.dense_variant,
        )
    if m.arch == "real_cnn":
        return RealCNNEncoder(
            conv_features=tuple(m.conv_features),
            dense_features=tuple(m.dense_features),
            vocab=m.vocab,
            kernel_size=tuple(m.kernel_size),
            pool_after=m.pool_after,
            pool_size=m.pool_size,
            dropout_rate=m.dropout_rate,
            dtype=dtype,
        )
    if m.arch == "qlstm":
        from qasr.models.qlstm import QLSTMEncoder

        # op_variant for the qlstm arch selects the gate-projection paths:
        #   auto/fast8_recurrent -> rank-8 everywhere — measured best
        #     (61.2 ms/step vs all-block 79.1 at config-4 shapes: the
        #     in-scan recurrent GEMM at M = 2B rows is WEIGHT-bandwidth
        #     bound, and rank-8 halves the weight bytes re-read every scan
        #     step; docs/performance.md)
        #   fast8 -> rank-8 pre-scan input GEMM only, block recurrent (A/B)
        #   block -> expanded block GEMM everywhere (reference strategy)
        #   pallas8 -> rank-8 input GEMM + SCAN-RESIDENT Pallas recurrence
        #     (weights VMEM-resident across all T steps; requires bf16 and
        #     lane-aligned hidden — qasr/ops/pallas/qlstm_scan.supported)
        if m.op_variant not in (
            "auto", "block", "fast8", "fast8_recurrent", "pallas8"
        ):
            raise ValueError(
                f"op_variant {m.op_variant!r} is not valid for arch='qlstm' "
                "(choose auto | block | fast8 | fast8_recurrent | pallas8)"
            )
        if m.op_variant == "block":
            input_proj = "block"
        elif m.op_variant == "fast8":
            input_proj = "fast8"  # explicit rank-8-input A/B arm
        else:
            # auto: picked per layer by the GEMM's row count M = B*T
            # (block wins at M >= 8192 — combo traffic scales with M;
            # qasr/models/qlstm._input_proj_fn)
            input_proj = "auto"
        if m.op_variant == "pallas8":
            recurrent = "pallas8"
            input_proj = "pallas8"
        else:
            recurrent = (
                "block" if m.op_variant in ("block", "fast8") else "fast8"
            )
        if m.op_variant == "auto" and recurrent == "fast8":
            # measured best on the v5e (docs/performance.md): the
            # scan-resident Pallas recurrence (38.9 vs 61.2 ms/step at
            # config-4 shapes). Routed where its contract holds: bf16,
            # lane-aligned hidden, bidirectional, TPU backend. Under a
            # DP-sharded mesh the op partitions on batch via its
            # custom_partitioning rule (weights/time replicated) — wiring
            # validated on the 8-device CPU mesh
            # (tests/test_qlstm.py::TestPallasScanSharded).
            import jax

            from qasr.ops.pallas import qlstm_scan

            if (
                jax.default_backend() == "tpu"
                and m.bidirectional
                and qlstm_scan.supported(m.lstm_features, dtype)
            ):
                recurrent = "pallas8"
        return QLSTMEncoder(
            conv_features=tuple(m.conv_features),
            dense_features=tuple(m.dense_features),
            lstm_features=m.lstm_features,
            lstm_layers=m.lstm_layers,
            bidirectional=m.bidirectional,
            vocab=m.vocab,
            pool_after=m.pool_after,
            pool_size=m.pool_size,
            dropout_rate=m.dropout_rate,
            dtype=dtype,
            use_pallas=m.use_pallas,
            input_proj=input_proj,
            recurrent=recurrent,
        )
    if m.arch == "real_lstm":
        from qasr.models.qlstm import RealLSTMEncoder

        return RealLSTMEncoder(
            conv_features=tuple(m.conv_features),
            dense_features=tuple(m.dense_features),
            lstm_features=m.lstm_features,
            lstm_layers=m.lstm_layers,
            bidirectional=m.bidirectional,
            vocab=m.vocab,
            pool_after=m.pool_after,
            pool_size=m.pool_size,
            dropout_rate=m.dropout_rate,
            dtype=dtype,
        )
    raise ValueError(f"unknown arch {m.arch!r}")


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=t.learning_rate,
        warmup_steps=t.warmup_steps,
        decay_steps=max(t.num_steps, t.warmup_steps + 1),
        end_value=t.learning_rate * 0.05,
    )
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )


def create_train_state(cfg: Config, rng: jax.Array, sample_features) -> TrainState:
    model = build_model(cfg)
    p_rng, d_rng = jax.random.split(rng)
    params = model.init(p_rng, jnp.asarray(sample_features), train=False)["params"]
    tx = build_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        dropout_rng=d_rng,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
