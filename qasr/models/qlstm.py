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

from qasr.models.layers import PReLU, QDense, flatten_quaternion
from qasr.ops.initializers import quaternion_initializer
from qasr.ops.qlinalg import qdense, qdense_fast8
from qasr.ops.quaternion import O8, U8, V8, hamilton_expand


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


def _input_proj_fn(name: str, rows: int = 0):
    """Pre-scan gate-projection op: auto | block | fast8 | pallas8 (rank-8
    Pallas GEMM with in-VMEM combo formation, qasr/ops/pallas/qgemm8.py).

    "auto" picks by the GEMM's row count M = B*T (measured on the v5e,
    docs/performance.md round 5): the rank-8 schemes pay combo traffic
    proportional to M*K while the block path pays a fixed 2x weight read +
    2x MXU FLOPs — at M = 4096 all three arms measure within noise
    (6.2-6.4 ms/layer) but by M = 16384 (the config-4 preset batch) block
    wins 1.23x (31.2 vs 38.4 ms/layer). Crossover set at M >= 8192."""
    if name == "auto":
        name = "block" if rows >= 8192 else "fast8"
    if name == "pallas8":
        from qasr.ops.pallas.qgemm8 import qdense_pallas8

        return qdense_pallas8
    return qdense_fast8 if name == "fast8" else qdense


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
    input_proj: str = "fast8"  # see QBiLSTM
    recurrent: str = "block"   # see QBiLSTM ("fast8" = rank-8 in-scan GEMM)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.recurrent == "pallas8":
            raise ValueError(
                "recurrent='pallas8' is bidirectional-only (QBiLSTM); the "
                "unidirectional layer would silently fall back otherwise"
            )
        b, t, cin4 = x.shape
        cin = cin4 // 4
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        wx, wh, bias = QLSTMCellParams(cin, self.hidden, name="cell")()
        wx, bias = wx.astype(dtype), bias.astype(dtype)

        # all-timestep input projection: one MXU GEMM (outside the scan);
        # the recurrent weights expand ONCE here — never inside the scan
        # (XLA does not reliably hoist the expansion out of the loop body).
        in_proj = _input_proj_fn(self.input_proj, b * t)
        xz = in_proj(x.reshape(b * t, cin4), wx).reshape(b, t, -1) + bias
        if self.recurrent == "fast8":
            wc8 = jnp.einsum(
                "akn,pa->pkn", wh, jnp.asarray(U8, wh.dtype)
            ).astype(dtype)  # [8, H, 4H]
            v8 = jnp.asarray(V8, dtype)
            o8 = jnp.asarray(O8, jnp.float32)
        else:
            wh_big = hamilton_expand(wh.astype(dtype))  # [4H, 16H]

        h0 = jnp.zeros((b, 4 * self.hidden), dtype)
        c0 = jnp.zeros((b, 4 * self.hidden), dtype)
        t_iota = jnp.arange(t)
        if self.reverse:
            t_iota = t_iota[::-1]

        def step(carry, inp):
            h, c = carry
            xz_t, t_idx = inp
            if self.recurrent == "fast8":
                hs_ = h.reshape(b, 4, self.hidden)
                hc = jnp.einsum("bak,pa->bpk", hs_, v8)
                prods = jnp.einsum(
                    "bpk,pkn->bpn", hc, wc8,
                    preferred_element_type=jnp.float32,
                )
                proj = jnp.einsum("bpn,qp->bqn", prods, o8).reshape(
                    b, 16 * self.hidden
                ).astype(dtype)
            else:
                proj = h @ wh_big
            z = xz_t + proj
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
    # input (pre-scan) projection: "fast8" = rank-8 scheme (8/16 the MXU
    # FLOPs of the expanded GEMM; the M = B*T row count fills the MXU, so
    # the cut pays — measured, docs/performance.md); "block" = expanded GEMM
    input_proj: str = "fast8"
    # recurrent projection: "block" (expanded in-scan GEMM) | "fast8"
    # (rank-8 in-scan einsums — halves the per-step HBM weight re-read) |
    # "pallas8" (scan-resident Pallas kernel, qasr/ops/pallas/qlstm_scan.py:
    # the rank-8 weights stay VMEM-resident across ALL T steps, deleting
    # the per-step weight re-read entirely — the measured config-4
    # bottleneck, docs/performance.md)
    recurrent: str = "block"

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
        in_proj = _input_proj_fn(self.input_proj, b * t)
        z = in_proj(x.reshape(b * t, cin4), wx_cat)
        zf, zb = qchannel_split(z, 2)  # each [B*T, 16H]
        zf = (zf + bf.astype(dtype)).reshape(b, t, -1)
        zb = (zb + bb.astype(dtype)).reshape(b, t, -1)

        if self.recurrent == "pallas8":
            from qasr.ops.pallas.qlstm_scan import qlstm_scan_fast8

            wc8 = jnp.stack(
                [
                    jnp.einsum("akn,pa->pkn", whf, jnp.asarray(U8, whf.dtype)),
                    jnp.einsum("akn,pa->pkn", whb, jnp.asarray(U8, whb.dtype)),
                ]
            ).astype(dtype)  # [2, 8, H, 4H]
            xs = jnp.stack(
                [jnp.moveaxis(zf, 1, 0), jnp.moveaxis(zb, 1, 0)[::-1]], axis=1
            )  # [T, 2, B, 16H], backward stream time-flipped
            hs = qlstm_scan_fast8(xs, wc8, lengths)  # [T, 2, B, 4H]
            fwd = jnp.moveaxis(hs[:, 0], 0, 1)
            bwd = jnp.moveaxis(hs[::-1, 1], 0, 1)
            return qchannel_concat([fwd, bwd])

        if self.recurrent == "fast8":
            # rank-8 recurrent path: per-direction U-combined weights
            wc8 = jnp.stack(
                [
                    jnp.einsum("akn,pa->pkn", whf, jnp.asarray(U8, whf.dtype)),
                    jnp.einsum("akn,pa->pkn", whb, jnp.asarray(U8, whb.dtype)),
                ]
            ).astype(dtype)  # [2, 8, H, 4H]
            v8 = jnp.asarray(V8, dtype)
            o8 = jnp.asarray(O8, jnp.float32)
        else:
            wh_big = jnp.stack(
                [
                    hamilton_expand(whf.astype(dtype)),
                    hamilton_expand(whb.astype(dtype)),
                ]
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
            if self.recurrent == "fast8":
                hs_ = h.reshape(2, b, 4, self.hidden)
                hc = jnp.einsum("dbak,pa->dbpk", hs_, v8)
                prods = jnp.einsum(
                    "dbpk,dpkn->dbpn", hc, wc8,
                    preferred_element_type=jnp.float32,
                )
                proj = jnp.einsum("dbpn,qp->dbqn", prods, o8).reshape(
                    2, b, 16 * self.hidden
                ).astype(dtype)
            else:
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
    input_proj: str = "fast8"   # pre-scan gate projection: fast8 | block | pallas8
    recurrent: str = "block"    # in-scan hidden projection: block | fast8 | pallas8
    # conv front-end routing (round 5: shared tower with QCNNEncoder, so
    # fat layers — e.g. config 4's 128->128 — take the measured-best
    # stacked rank-8 path instead of per-layer packed routing)
    conv_variant: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        lengths: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        from qasr.models.qcnn import quaternion_conv_tower

        if x.ndim != 4:
            raise ValueError(f"expected [B, T, F, 4*C] input, got {x.shape}")
        x, in_stacked = quaternion_conv_tower(
            x,
            conv_features=self.conv_features,
            kernel_size=self.kernel_size,
            pool_after=self.pool_after,
            pool_size=self.pool_size,
            dropout_rate=self.dropout_rate,
            conv_dropout=False,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            variant=self.conv_variant,
            train=train,
        )
        if in_stacked:
            # fused exit: stacked [B,4,F,T,C] -> flattened packed
            # [B,T,4*(F*C)] in ONE transpose
            b_, _, f_, t_, c_ = x.shape
            x = x.transpose(0, 3, 1, 2, 4).reshape(b_, t_, 4 * f_ * c_)
        else:
            x = flatten_quaternion(x)  # [B, T, 4*(F*C)]

        for i in range(self.lstm_layers):
            if self.bidirectional:
                x = QBiLSTM(
                    self.lstm_features,
                    dtype=self.dtype,
                    input_proj=self.input_proj,
                    recurrent=self.recurrent,
                    name=f"qbilstm_{i}",
                )(x, lengths)
            else:
                x = QLSTMLayer(
                    self.lstm_features,
                    dtype=self.dtype,
                    input_proj=self.input_proj,
                    recurrent=self.recurrent,
                    name=f"qlstm_{i}",
                )(x, lengths)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        for i, feats in enumerate(self.dense_features):
            x = QDense(features=feats, dtype=self.dtype, use_pallas=self.use_pallas,
                       name=f"qdense_{i}")(x)
            x = PReLU(name=f"dense_prelu_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        logits = nn.Dense(self.vocab, dtype=self.dtype, name="output")(x)
        return logits.astype(jnp.float32)


class RealBiLSTM(nn.Module):
    """Real-valued bidirectional LSTM with the SAME fused-scan structure as
    QBiLSTM (one scan, direction axis 2, pre-scan input projection) so the
    quaternion-vs-real comparison isolates the Hamilton-product arithmetic,
    not the scan engineering. ``hidden`` counts REAL units."""

    hidden: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, lengths: jnp.ndarray | None = None):
        b, t, cin = x.shape
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        h4 = 4 * self.hidden
        init = nn.initializers.glorot_uniform()
        wx = self.param("wx", init, (2, cin, h4))
        wh = self.param("wh", init, (2, self.hidden, h4))
        bias = self.param("bias", nn.initializers.zeros, (2, h4))

        # both directions' input projections as one GEMM
        z = jax.lax.dot_general(
            x.reshape(b * t, cin),
            jnp.moveaxis(wx.astype(dtype), 0, 1).reshape(cin, 2 * h4),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(b, t, 2, h4)
        z = z + bias.astype(dtype)
        zf = z[:, :, 0]
        zb = z[:, :, 1]

        xs = jnp.stack(
            [jnp.moveaxis(zf, 1, 0), jnp.moveaxis(zb, 1, 0)[::-1]], axis=1
        )  # [T, 2, B, 4H]
        h0 = jnp.zeros((2, b, self.hidden), dtype)
        c0 = jnp.zeros((2, b, self.hidden), dtype)
        t_iota = jnp.arange(t)
        wh_d = wh.astype(dtype)

        def step(carry, inp):
            h, c = carry
            xz_t, t_idx = inp
            proj = jax.lax.dot_general(
                h, wh_d, dimension_numbers=(((2,), (1,)), ((0,), (0,)))
            ).astype(dtype)  # [2, B, 4H]
            zt = xz_t + proj
            i, f, o, g = jnp.split(zt, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            if lengths is not None:
                active = jnp.stack(
                    [t_idx < lengths, (t - 1 - t_idx) < lengths]
                )[:, :, None]
                h_new = jnp.where(active, h_new, h)
                c_new = jnp.where(active, c_new, c)
            return (h_new, c_new), h_new

        (_, _), hs = jax.lax.scan(step, (h0, c0), (xs, t_iota), unroll=4)
        fwd = jnp.moveaxis(hs[:, 0], 0, 1)
        bwd = jnp.moveaxis(hs[::-1, 1], 0, 1)
        return jnp.concatenate([fwd, bwd], axis=-1)


class RealLSTMEncoder(nn.Module):
    """Real-valued CNN-LSTM at equal real width (4x the quaternion feature
    counts) — the ablation arm for BASELINE config 4, mirroring
    RealCNNEncoder's role for the conv models: identical topology and scan
    structure, ordinary real arithmetic, 4x the parameters."""

    conv_features: Sequence[int] = (64, 64, 128, 128)
    dense_features: Sequence[int] = (256,)
    lstm_features: int = 256       # quaternion channels; real width = 4x
    lstm_layers: int = 3
    bidirectional: bool = True
    vocab: int = 32
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
        lengths: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(f"expected [B, T, F, C] input, got {x.shape}")
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
                    x, window_shape=(1, self.pool_size), strides=(1, self.pool_size)
                )
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)

        for i in range(self.lstm_layers):
            if self.bidirectional:
                x = RealBiLSTM(
                    4 * self.lstm_features, dtype=self.dtype, name=f"bilstm_{i}"
                )(x, lengths)
            else:
                raise NotImplementedError("real ablation is bidirectional-only")
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        for i, feats in enumerate(self.dense_features):
            x = nn.Dense(4 * feats, dtype=self.dtype, name=f"dense_{i}")(x)
            x = PReLU(name=f"dense_prelu_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.vocab, dtype=self.dtype, name="output")(x)
        return logits.astype(jnp.float32)
