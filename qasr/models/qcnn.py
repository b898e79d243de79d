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


def quaternion_conv_tower(
    x: jnp.ndarray,
    *,
    conv_features: Sequence[int],
    kernel_size: tuple[int, int],
    pool_after: int,
    pool_size: int,
    dropout_rate: float,
    conv_dropout: bool,
    dtype,
    use_pallas: bool,
    variant: str,
    train: bool,
) -> tuple[jnp.ndarray, bool]:
    """The shared quaternion conv tower with the measured-best routing.

    Encoder-agnostic (round-5: used by both QCNNEncoder and QLSTMEncoder so
    the stacked-chain routing applies wherever fat conv layers appear, not
    just the QCNN). MUST be called from inside the encoder's ``@nn.compact``
    ``__call__`` — the QConv/PReLU submodules bind to the caller's scope
    under the names ``qconv_i`` / ``conv_prelu_i``, keeping checkpoints
    compatible across encoders and layout variants.

    Routing (docs/performance.md): fat layers (>= 128 quaternion channels
    in AND out) run in the component-stacked F-major layout — entered even
    for a SINGLE qualifying layer (measured: one-layer stacked round trip
    1.79 ms vs best packed 2.09 at 128->128 B8 T512 F13 fwd+bwd, round 5)
    — with the rank-8 scheme; thin layers keep the per-layer packed
    routing. Returns ``(x, in_stacked)``; if ``in_stacked`` the result is
    still ``[B, 4, F, T, C]`` and the caller owns the exit transpose (or a
    stacked-entry consumer).
    """
    chain_variant = {
        "auto": "stacked8",
        "stacked": "stacked",
        "stacked8": "stacked8",
        "stacked8g": "stacked8g",    # grouped single-dispatch rank-8
        "fused": "fused",
        "fused8": "fused8",
        "fusedchain": "stacked",     # non-chain fallback for these
        "fusedchain8": "stacked8",
    }.get(variant)
    want_fused_chain = variant in ("fusedchain", "fusedchain8")
    if use_pallas:
        # legacy knob selecting the im2col Pallas conv (QConv packed
        # path); honor it rather than silently rerouting those layers
        # into the stacked chain
        chain_variant = None
        want_fused_chain = False
    in_stacked = False
    n_conv = len(conv_features)
    i = 0
    while i < n_conv:
        feats = conv_features[i]
        cin = (x.shape[-1] if in_stacked else x.shape[-1] // 4)
        if in_stacked and min(cin, feats) < 128:
            # chain exit: a thin layer after fat ones leaves the stacked
            # layout (per-product MXU lanes below 128 measured 0.64x the
            # block path — docs/performance.md)
            x = stacked_to_tf_packed(x)
            in_stacked = False
        if (
            chain_variant
            and not in_stacked
            and i >= pool_after
            and len(kernel_size) == 2
            and min(cin, feats) >= 128
        ):
            if want_fused_chain:
                end = _fused_chain_end(
                    i, cin, conv_features, kernel_size, conv_dropout, dtype
                )
                if end - i >= 2:  # amortizes entry/exit over >= 2 layers
                    x = _fused_chain(
                        x, i, end,
                        conv_features=conv_features,
                        kernel_size=kernel_size,
                        dtype=dtype,
                        variant=variant,
                    )
                    i = end
                    in_stacked = True
                    continue
            x = tf_packed_to_stacked(x)
            in_stacked = True
        if in_stacked:
            layer_variant = chain_variant
        else:
            # thin layers: legacy measured routing (block below 128)
            layer_variant = "auto" if chain_variant else variant
        x = QConv(
            features=feats,
            kernel_size=kernel_size,
            dtype=dtype,
            use_pallas=use_pallas,
            variant=layer_variant,
            layout="stacked_ft" if in_stacked else "btfc",
            name=f"qconv_{i}",
        )(x)
        x = PReLU(name=f"conv_prelu_{i}")(x)
        if i + 1 == pool_after:
            # pool along frequency only — time resolution feeds CTC
            # (always before stacked entry: gate requires i >= pool_after)
            x = nn.max_pool(
                x,
                window_shape=(1, pool_size),
                strides=(1, pool_size),
            )
        if conv_dropout:
            x = nn.Dropout(dropout_rate, deterministic=not train)(x)
        i += 1
    return x, in_stacked


def _fused_chain_end(start, cin, conv_features, kernel_size, conv_dropout, dtype):
    """Largest ``end`` such that layers [start, end) can run in the
    chain-resident kernel (qconv_chain.supported for every link, no
    dropout between convs, bf16 compute)."""
    from qasr.ops.pallas import qconv_chain

    if conv_dropout or dtype != jnp.bfloat16:
        return start
    end = start
    c = cin
    while end < len(conv_features):
        feats = conv_features[end]
        if not qconv_chain.supported(
            c, feats, kernel_size, "SAME", None, dtype=dtype
        ):
            break
        c = feats
        end += 1
    return end


def _fused_chain(x, start, end, *, conv_features, kernel_size, dtype, variant):
    """Run conv layers [start, end) chain-resident: pad once, per-layer
    fused kernels passing PRE-activations (PReLU fused into the next
    kernel's prologue), slice once, apply the last PReLU in XLA.

    Param names/shapes match the per-layer path exactly (qconv_i /
    conv_prelu_i), so checkpoints transfer between variants bit-for-bit.
    Returns the post-activation STACKED tensor [B, 4, F, T, C].
    """
    from qasr.ops.pallas import qconv_chain

    x_st = tf_packed_to_stacked(x)
    _, _, f, t, _ = x_st.shape
    kw = kernel_size[1]
    xp = qconv_chain.chain_entry(x_st.astype(dtype), kw)
    alpha_prev = None
    for k in range(start, end):
        xp = QConv(
            features=conv_features[k],
            kernel_size=kernel_size,
            dtype=dtype,
            variant=variant,
            layout="padded_ft",
            name=f"qconv_{k}",
        )(xp, prologue_alpha=alpha_prev, t_valid=t)
        if k < end - 1:
            alpha_prev = PReLU(name=f"conv_prelu_{k}")(
                xp, return_slope=True
            )
    x_st = qconv_chain.chain_exit(xp, f, t, kw)
    return PReLU(name=f"conv_prelu_{end - 1}")(x_st)


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
        # "stacked"/"fused"/"fusedchain" (and "auto", which resolves to the
        # measured-best — docs/performance.md) run the fat post-pool conv
        # layers in the component-stacked F-major layout: one transpose in,
        # one out, zero per-layer repacking. Thin layers keep the legacy
        # per-layer routing (block below 128 q-channels). Shared with
        # QLSTMEncoder via quaternion_conv_tower (round 5).
        x, in_stacked = quaternion_conv_tower(
            x,
            conv_features=self.conv_features,
            kernel_size=self.kernel_size,
            pool_after=self.pool_after,
            pool_size=self.pool_size,
            dropout_rate=self.dropout_rate,
            conv_dropout=self.conv_dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            variant=self.variant,
            train=train,
        )

        dense_start = 0
        if in_stacked and self.dense_variant == "fast8_stacked" and self.dense_features:
            # stacked-entry dense: the first dense layer consumes the
            # stacked conv output directly (rank-8, K = F*C) — no conv-exit
            # transpose at all; its output is already packed
            x = QDense(
                features=self.dense_features[0],
                dtype=self.dtype,
                layout="stacked_entry",
                name="qdense_0",
            )(x)
            x = PReLU(name="dense_prelu_0")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            dense_start = 1
        elif in_stacked:
            # fused exit: stacked [B,4,F,T,C] -> flattened packed
            # [B,T,4*(F*C)] in ONE transpose (equivalent to
            # flatten_quaternion(stacked_to_tf_packed(x)) which would pay two)
            b_, _, f_, t_, c_ = x.shape
            x = x.transpose(0, 3, 1, 2, 4).reshape(b_, t_, 4 * f_ * c_)
        else:
            # fold (F, 4C) -> packed 4*(F*C) keeping component-major layout
            x = flatten_quaternion(x)
        for i in range(dense_start, len(self.dense_features)):
            feats = self.dense_features[i]
            x = QDense(
                features=feats,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                variant="auto" if self.dense_variant == "fast8_stacked"
                else self.dense_variant,
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
