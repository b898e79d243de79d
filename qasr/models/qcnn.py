"""QCNN / real-CNN acoustic model topologies.

Capability parity: the reference builds ~10-layer 3x3 quaternion conv stacks
with early frequency max-pooling, PReLU, dropout, then 3 (quaternion) dense
layers and a softmax over 62 CTC symbols, following Zhang et al. 2016
(SURVEY.md §2a C7, provenance [PAPER §4]; mount empty — no file:line). The
real-CNN baseline at equal feature-map count is the paper's ablation and the
kernel roofline comparison target (BASELINE.json config 3).

Input: packed quaternion features ``[B, T, F_mel, 4]`` (one quaternion channel
whose components are fbank/Δ/ΔΔ/ΔΔΔ). Time stride is always 1 so CTC frame
lengths pass through unchanged.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from qasr.models.layers import (
    PReLU,
    QConv,
    QDense,
    flatten_quaternion,
    stacked_to_tf_packed,
    tf_packed_to_stacked,
)


class QCNNEncoder(nn.Module):
    """Quaternion CNN encoder -> framewise CTC logits ``[B, T, vocab]``."""

    conv_features: Sequence[int] = (32, 32, 64, 64, 64, 64, 64, 64, 64, 64)
    dense_features: Sequence[int] = (256, 256, 256)
    vocab: int = 62
    kernel_size: tuple[int, int] = (3, 3)
    pool_after: int = 1          # freq max-pool after this many conv layers
    pool_size: int = 3
    dropout_rate: float = 0.3
    conv_dropout: bool = False
    dtype: jnp.dtype | None = None
    use_pallas: bool = False
    variant: str = "block"
    dense_variant: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        lengths: jnp.ndarray | None = None,  # frame-local model: unused
    ) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(f"expected [B, T, F, 4*C] input, got {x.shape}")
        # "stacked"/"fused" (and "auto", which resolves to the measured-best
        # of the two — docs/performance.md) run the fat post-pool conv layers
        # in the component-stacked F-major layout: one transpose in, one out,
        # zero per-layer repacking. Thin layers keep the legacy per-layer
        # routing (block below 128 q-channels).
        # "auto" = measured-best full-step path on v5e: the XLA rank-8
        # stacked chain (benchmarks/variants.py 2026-08-20: stacked8 1.61x
        # vs real CNN, legacy fast10 routing 1.38x, Pallas fused8 1.42x)
        chain_variant = {
            "auto": "stacked8",
            "stacked": "stacked",
            "stacked8": "stacked8",
            "fused": "fused",
            "fused8": "fused8",
        }.get(self.variant)
        if self.use_pallas:
            # legacy knob selecting the im2col Pallas conv (QConv packed
            # path); honor it rather than silently rerouting those layers
            # into the stacked chain
            chain_variant = None
        in_stacked = False
        for i, feats in enumerate(self.conv_features):
            cin = (x.shape[-1] if in_stacked else x.shape[-1] // 4)
            if (
                chain_variant
                and not in_stacked
                and i >= self.pool_after
                and len(self.kernel_size) == 2
                and min(cin, feats) >= 128
            ):
                x = tf_packed_to_stacked(x)
                in_stacked = True
            if in_stacked:
                layer_variant = chain_variant
            else:
                # thin layers: legacy measured routing (block below 128)
                layer_variant = "auto" if chain_variant else self.variant
            x = QConv(
                features=feats,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                variant=layer_variant,
                layout="stacked_ft" if in_stacked else "btfc",
                name=f"qconv_{i}",
            )(x)
            x = PReLU(name=f"conv_prelu_{i}")(x)
            if i + 1 == self.pool_after:
                # pool along frequency only — time resolution feeds CTC
                # (always before stacked entry: gate requires i >= pool_after)
                x = nn.max_pool(
                    x,
                    window_shape=(1, self.pool_size),
                    strides=(1, self.pool_size),
                )
            if self.conv_dropout:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        if in_stacked:
            # fused exit: stacked [B,4,F,T,C] -> flattened packed
            # [B,T,4*(F*C)] in ONE transpose (equivalent to
            # flatten_quaternion(stacked_to_tf_packed(x)) which would pay two)
            b_, _, f_, t_, c_ = x.shape
            x = x.transpose(0, 3, 1, 2, 4).reshape(b_, t_, 4 * f_ * c_)
        else:
            # fold (F, 4C) -> packed 4*(F*C) keeping component-major layout
            x = flatten_quaternion(x)
        for i, feats in enumerate(self.dense_features):
            x = QDense(
                features=feats,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                variant=self.dense_variant,
                name=f"qdense_{i}",
            )(x)
            x = PReLU(name=f"dense_prelu_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        logits = nn.Dense(
            self.vocab,
            dtype=self.dtype,
            name="output",
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        return logits.astype(jnp.float32)


class RealCNNEncoder(nn.Module):
    """Real-valued CNN baseline at equal feature-map count (4x params).

    The paper's ablation: identical topology with ordinary real convs whose
    channel count matches the quaternion model's real width (4*features).
    """

    conv_features: Sequence[int] = (32, 32, 64, 64, 64, 64, 64, 64, 64, 64)
    dense_features: Sequence[int] = (256, 256, 256)
    vocab: int = 62
    kernel_size: tuple[int, int] = (3, 3)
    pool_after: int = 1
    pool_size: int = 3
    dropout_rate: float = 0.3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        lengths: jnp.ndarray | None = None,  # frame-local model: unused
    ) -> jnp.ndarray:
        for i, feats in enumerate(self.conv_features):
            x = nn.Conv(
                features=4 * feats,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = PReLU(name=f"conv_prelu_{i}")(x)
            if i + 1 == self.pool_after:
                x = nn.max_pool(
                    x,
                    window_shape=(1, self.pool_size),
                    strides=(1, self.pool_size),
                )

        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)
        for i, feats in enumerate(self.dense_features):
            x = nn.Dense(4 * feats, dtype=self.dtype, name=f"dense_{i}")(x)
            x = PReLU(name=f"dense_prelu_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.vocab, dtype=self.dtype, name="output")(x)
        return logits.astype(jnp.float32)
