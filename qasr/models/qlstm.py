"""Quaternion LSTM hybrid encoder — BASELINE.json config 4.

Capability: the QCNN-LSTM hybrid (quaternion conv front-end + recurrent
encoder) from the reference family's QLSTM work (Parcollet et al.,
arXiv:1811.02566, PAPERS.md; SURVEY.md §7 stage 8). Gate projections are
Hamilton-product quaternion dense ops; gate nonlinearities and the cell/hidden
elementwise products are *split* (component-wise), per the paper.

TPU-first structure: the input projections for all timesteps run as one big
quaternion GEMM outside the recurrence; the recurrent weights expand to the
block form once outside the scan; `lax.scan` carries only the hidden matmul +
pointwise cell update. Bidirectional runs BOTH directions in one fused scan
(direction axis of 2, backward stream time-flipped) — half the sequential
scan latency and double the MXU row count per step. Optional ``lengths``
freeze the state past each utterance's last frame so padding never
contaminates either direction.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from qasr.models.layers import PReLU, QConv, QDense, flatten_quaternion
from qasr.ops.initializers import quaternion_initializer
from qasr.ops.qlinalg import qdense
from qasr.ops.quaternion import hamilton_expand


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


def _gate_update(z, c, split_groups=4):
    zi, zf, zo, zg = qchannel_split(z, split_groups)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    o = jax.nn.sigmoid(zo)
    g = jnp.tanh(zg)
    c_new = f * c + i * g              # split products (paper)
    return o * jnp.tanh(c_new), c_new


class QLSTMLayer(nn.Module):
    """Unidirectional quaternion LSTM over ``[B, T, 4*Cin]`` -> ``[B, T, 4*H]``.

    ``lengths`` (optional ``[B]``) freezes (h, c) past each utterance's last
    frame so padded frames never contaminate the state.
    """

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
        b, t, cin4 = x.shape
        cin = cin4 // 4
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        wx, wh, bias = QLSTMCellParams(cin, self.hidden, name="cell")()
        wx, bias = wx.astype(dtype), bias.astype(dtype)

        # all-timestep input projection: one MXU GEMM (outside the scan);
        # the recurrent weights expand ONCE here — never inside the scan
        # (XLA does not reliably hoist the expansion out of the loop body).
        xz = qdense(x.reshape(b * t, cin4), wx).reshape(b, t, -1) + bias
        wh_big = hamilton_expand(wh.astype(dtype))  # [4H, 16H]

        h0 = jnp.zeros((b, 4 * self.hidden), dtype)
        c0 = jnp.zeros((b, 4 * self.hidden), dtype)
        t_iota = jnp.arange(t)
        if self.reverse:
            t_iota = t_iota[::-1]

        def step(carry, inp):
            h, c = carry
            xz_t, t_idx = inp
            z = xz_t + h @ wh_big
            h_new, c_new = _gate_update(z, c)
            if lengths is not None:
                active = (t_idx < lengths)[:, None]
                h_new = jnp.where(active, h_new, h)
                c_new = jnp.where(active, c_new, c)
            return (h_new, c_new), h_new

        xs = (jnp.moveaxis(xz, 1, 0), t_iota)  # [T, B, .]
        (_, _), hs = jax.lax.scan(step, (h0, c0), xs, reverse=self.reverse)
        return jnp.moveaxis(hs, 0, 1)  # [B, T, 4H]


class QBiLSTM(nn.Module):
    """Bidirectional quaternion LSTM as ONE fused scan.

    Both directions run in a single `lax.scan` with a direction axis of 2
    (the backward stream's inputs are time-flipped, its outputs un-flipped):
    half the sequential scan latency of two scans, and the per-step recurrent
    matmul doubles its row count — better MXU occupancy at small B. The
    recurrent projection is a batched dot against the pre-expanded ``[2, 4H,
    16H]`` weights.
    """

    hidden: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, lengths: jnp.ndarray | None = None):
        b, t, cin4 = x.shape
        cin = cin4 // 4
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        wxf, whf, bf = QLSTMCellParams(cin, self.hidden, name="fwd_cell")()
        wxb, whb, bb = QLSTMCellParams(cin, self.hidden, name="bwd_cell")()

        # both directions' input projections as ONE quaternion GEMM
        wx_cat = jnp.concatenate([wxf, wxb], axis=-1).astype(dtype)  # [4,cin,8H]
        z = qdense(x.reshape(b * t, cin4), wx_cat)
        zf, zb = qchannel_split(z, 2)  # each [B*T, 16H]
        zf = (zf + bf.astype(dtype)).reshape(b, t, -1)
        zb = (zb + bb.astype(dtype)).reshape(b, t, -1)

        wh_big = jnp.stack(
            [hamilton_expand(whf.astype(dtype)), hamilton_expand(whb.astype(dtype))]
        )  # [2, 4H, 16H]

        # xs: [T, 2, B, 16H]; backward stream time-flipped
        xs = jnp.stack(
            [jnp.moveaxis(zf, 1, 0), jnp.moveaxis(zb, 1, 0)[::-1]], axis=1
        )
        h0 = jnp.zeros((2, b, 4 * self.hidden), dtype)
        c0 = jnp.zeros((2, b, 4 * self.hidden), dtype)
        t_iota = jnp.arange(t)

        def step(carry, inp):
            h, c = carry
            xz_t, t_idx = inp
            proj = jax.lax.dot_general(
                h,
                wh_big,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            ).astype(dtype)  # [2, B, 16H]
            h_new, c_new = _gate_update(xz_t + proj, c)
            if lengths is not None:
                # dir 0 walks t forward; dir 1 walks the flipped stream, so
                # its original frame index is T-1-t
                active = jnp.stack(
                    [t_idx < lengths, (t - 1 - t_idx) < lengths]
                )[:, :, None]  # [2, B, 1]
                h_new = jnp.where(active, h_new, h)
                c_new = jnp.where(active, c_new, c)
            return (h_new, c_new), h_new

        (_, _), hs = jax.lax.scan(step, (h0, c0), (xs, t_iota), unroll=4)  # [T, 2, B, 4H]
        fwd = jnp.moveaxis(hs[:, 0], 0, 1)
        bwd = jnp.moveaxis(hs[::-1, 1], 0, 1)
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
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        lengths: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
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
                x = QBiLSTM(self.lstm_features, dtype=self.dtype, name=f"qbilstm_{i}")(
                    x, lengths
                )
            else:
                x = QLSTMLayer(self.lstm_features, dtype=self.dtype, name=f"qlstm_{i}")(
                    x, lengths
                )
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        for i, feats in enumerate(self.dense_features):
            x = QDense(features=feats, dtype=self.dtype, use_pallas=self.use_pallas,
                       name=f"qdense_{i}")(x)
            x = PReLU(name=f"dense_prelu_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        logits = nn.Dense(self.vocab, dtype=self.dtype, name="output")(x)
        return logits.astype(jnp.float32)
