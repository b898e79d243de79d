"""Quaternion LSTM hybrid encoder — BASELINE.json config 4.

Capability: the QCNN-LSTM hybrid (quaternion conv front-end + recurrent
encoder) from the reference family's QLSTM work (Parcollet et al.,
arXiv:1811.02566, PAPERS.md; SURVEY.md §7 stage 8). Gate projections are
Hamilton-product quaternion dense ops; gate nonlinearities and the cell/hidden
elementwise products are *split* (component-wise), per the paper.

TPU-first structure: the input projections for all timesteps run as one big
quaternion GEMM outside the recurrence (MXU-batched); `lax.scan` carries only
the hidden projection + pointwise cell update. Bidirectional = forward scan +
time-reversed scan, concatenated in quaternion-channel space.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from qasr.models.layers import PReLU, QConv, QDense, flatten_quaternion
from qasr.ops.initializers import quaternion_initializer
from qasr.ops.qlinalg import qdense


def qchannel_split(x: jnp.ndarray, groups: int) -> tuple[jnp.ndarray, ...]:
    """Split packed ``[..., 4*G*H]`` into G packed ``[..., 4*H]`` tensors,
    preserving component-major layout."""
    *lead, c4 = x.shape
    gh = c4 // 4
    h = gh // groups
    x = x.reshape(*lead, 4, groups, h)
    return tuple(
        x[..., g, :].reshape(*lead, 4 * h) for g in range(groups)
    )


def qchannel_concat(parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate packed quaternion tensors along the quaternion-channel dim."""
    *lead, _ = parts[0].shape
    stacked = [p.reshape(*lead, 4, -1) for p in parts]
    return jnp.concatenate(stacked, axis=-1).reshape(*lead, -1)


class QLSTMCellParams(nn.Module):
    """Parameter container: one quaternion projection for all 4 gates."""

    in_features: int   # quaternion input channels
    hidden: int        # quaternion hidden channels

    @nn.compact
    def __call__(self):
        wx = self.param(
            "wx", quaternion_initializer("glorot"), (4, self.in_features, 4 * self.hidden)
        )
        wh = self.param(
            "wh", quaternion_initializer("glorot"), (4, self.hidden, 4 * self.hidden)
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * 4 * self.hidden,))
        return wx, wh, bias


class QLSTMLayer(nn.Module):
    """Unidirectional quaternion LSTM over ``[B, T, 4*Cin]`` -> ``[B, T, 4*H]``."""

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, cin4 = x.shape
        cin = cin4 // 4
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        wx, wh, bias = QLSTMCellParams(cin, self.hidden, name="cell")()
        wx, wh, bias = wx.astype(dtype), wh.astype(dtype), bias.astype(dtype)

        # all-timestep input projection: one MXU GEMM (outside the scan)
        xz = qdense(x.reshape(b * t, cin4), wx).reshape(b, t, -1) + bias

        h0 = jnp.zeros((b, 4 * self.hidden), dtype)
        c0 = jnp.zeros((b, 4 * self.hidden), dtype)

        def step(carry, xz_t):
            h, c = carry
            z = xz_t + qdense(h, wh)
            zi, zf, zo, zg = qchannel_split(z, 4)
            i = jax.nn.sigmoid(zi)
            f = jax.nn.sigmoid(zf)
            o = jax.nn.sigmoid(zo)
            g = jnp.tanh(zg)
            c_new = f * c + i * g          # split products (paper)
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        xs = jnp.moveaxis(xz, 1, 0)  # [T, B, .]
        (_, _), hs = jax.lax.scan(step, (h0, c0), xs, reverse=self.reverse)
        return jnp.moveaxis(hs, 0, 1)  # [B, T, 4H]


class QBiLSTM(nn.Module):
    hidden: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fwd = QLSTMLayer(self.hidden, reverse=False, dtype=self.dtype, name="fwd")(x)
        bwd = QLSTMLayer(self.hidden, reverse=True, dtype=self.dtype, name="bwd")(x)
        return qchannel_concat([fwd, bwd])


class QLSTMEncoder(nn.Module):
    """Quaternion conv front-end + (bi)QLSTM encoder -> CTC logits."""

    conv_features: Sequence[int] = (64, 64, 128, 128)
    dense_features: Sequence[int] = (256,)
    lstm_features: int = 256
    lstm_layers: int = 3
    bidirectional: bool = True
    vocab: int = 32
    kernel_size: tuple[int, int] = (3, 3)
    pool_after: int = 1
    pool_size: int = 3
    dropout_rate: float = 0.3
    dtype: jnp.dtype | None = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(f"expected [B, T, F, 4*C] input, got {x.shape}")
        for i, feats in enumerate(self.conv_features):
            x = QConv(
                features=feats,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"qconv_{i}",
            )(x)
            x = PReLU(name=f"conv_prelu_{i}")(x)
            if i + 1 == self.pool_after:
                x = nn.max_pool(
                    x, window_shape=(1, self.pool_size), strides=(1, self.pool_size)
                )
        x = flatten_quaternion(x)  # [B, T, 4*(F*C)]

        for i in range(self.lstm_layers):
            if self.bidirectional:
                x = QBiLSTM(self.lstm_features, dtype=self.dtype, name=f"qbilstm_{i}")(x)
            else:
                x = QLSTMLayer(self.lstm_features, dtype=self.dtype, name=f"qlstm_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        for i, feats in enumerate(self.dense_features):
            x = QDense(features=feats, dtype=self.dtype, use_pallas=self.use_pallas,
                       name=f"qdense_{i}")(x)
            x = PReLU(name=f"dense_prelu_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        logits = nn.Dense(self.vocab, dtype=self.dtype, name="output")(x)
        return logits.astype(jnp.float32)
