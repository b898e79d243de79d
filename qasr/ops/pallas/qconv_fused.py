"""Fused direct quaternion conv2d — halo-tiled Pallas kernel (R1, SURVEY §2b).

The im2col formulation (qgemm.py) materializes kh*kw-times-blown-up patches
in HBM, which caps it at ~20 TF on large channel counts. This kernel keeps
the expansion entirely in VMEM:

* the spatially padded input stays in HBM (`pltpu.ANY`); each grid step DMAs
  ONE halo-extended time tile ``[TT+kh-1, Fp, 4C]`` into VMEM scratch —
  activations are read ~once (plus the small halo overlap),
* the 10-product Hamilton combos (quaternion.py) are formed on the VPU from
  that tile, giving lhs matrices whose contraction dim is a full channel
  block C (>= 128 for MXU tiles),
* all kh*kw spatial offsets become static row-shifted slices of the combo
  buffer — the conv is kh*kw*10 MXU dots accumulated in f32,
* the weight-combination tensor ``wc [10, kh*kw, C, TN]`` sits resident in
  VMEM across the whole (batch, time) grid (its block index only changes
  with the outermost N-tile index) — weights are fetched N/TN times total,
  never 4x-expanded.

Output is produced component-stacked ``[B, 4, T, F, N]``; the XLA wrapper
transposes to the packed layout once. Backward delegates to the vjp of the
mathematically-identical XLA block conv (which runs at ~90% of peak), so
training through this kernel is exact; Pallas backward kernels are a later
optimization.

Constraints: stride 1, odd kernel, SAME or VALID padding handled by the
wrapper's XLA pad; C (quaternion in-channels) >= 128-friendly sizes — the
layer gating in qasr/models/layers.py routes smaller layers to XLA. Use
bf16 activations at its design shapes (C=256): Mosaic compile times blow up
(>15 min) for f32 inputs at C=128 — another reason default routing prefers
the XLA paths (docs/performance.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.quaternion import W_COMBO
from qasr.ops.pallas.qgemm import _OUT_TERMS, _X_TERMS

_TT = 16  # time rows per tile; rows = TT*Fp stays a multiple of 16 (bf16 sublane)


def _fused_kernel(
    wc_ref,   # [10, S, C, TN] VMEM (resident per N-tile)
    xp_hbm,   # [B, Tp, Fp, 4C] in HBM/ANY
    o_ref,    # [1, 4, TT, F, TN] VMEM block
    xt_ref,   # scratch [TT + kh-1, Fp, 4C]
    sem,      # DMA semaphore
    *,
    kh: int,
    kw: int,
    f_out: int,
):
    j = pl.program_id(0)  # N tile (outermost: keeps wc resident)
    b = pl.program_id(1)
    i = pl.program_id(2)  # time tile

    rows_ext, fp, c4 = xt_ref.shape
    c = c4 // 4
    tn = wc_ref.shape[3]

    # DMA the halo-extended time tile for (b, i): rows [i*TT, i*TT + TT+kh-1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(i * _TT, rows_ext)], xt_ref, sem
    )
    dma.start()
    dma.wait()

    xt = xt_ref[:]  # [rows_ext, Fp, 4C]; Fp is a sublane multiple (wrapper)
    # 10 Hamilton input combos flattened to rows; pre-shift once per df so the
    # per-(dt,df) slices start at dt*Fp — sublane-aligned, no per-dot relayout.
    m = _TT * fp  # output rows in padded-f coordinates
    shifted = []  # [kw][10] -> [rows_ext*fp, c]
    base = []
    for p in range(10):
        terms = _X_TERMS[p]
        v = xt[..., terms[0] * c : (terms[0] + 1) * c]
        if len(terms) == 2:
            v = v + xt[..., terms[1] * c : (terms[1] + 1) * c]
        base.append(
            jnp.pad(v.reshape(rows_ext * fp, c), ((0, kw - 1), (0, 0)))
        )
    for df in range(kw):
        shifted.append([base[p][df : df + rows_ext * fp] for p in range(10)])

    acc = [jnp.zeros((m, tn), jnp.float32) for _ in range(4)]
    for dt in range(kh):
        for df in range(kw):
            for p in range(10):
                lhs = shifted[df][p][dt * fp : dt * fp + m]
                prod = jnp.dot(
                    lhs, wc_ref[p, dt * kw + df], preferred_element_type=jnp.float32
                )
                for bcomp, sign in _OUT_B_OF_P[p]:
                    acc[bcomp] = acc[bcomp] + prod if sign > 0 else acc[bcomp] - prod

    for bcomp in range(4):
        y = acc[bcomp].reshape(_TT, fp, tn)[:, :f_out, :]
        o_ref[0, bcomp] = y.astype(o_ref.dtype)


# inverse index of _OUT_TERMS: for each product p, the (out-component, sign)
# pairs it contributes to.
_OUT_B_OF_P = [[] for _ in range(10)]
for _b in range(4):
    for _p, _s in _OUT_TERMS[_b]:
        _OUT_B_OF_P[_p].append((_b, _s))


def _pad_dim(x, axis, mult):
    rem = (-x.shape[axis]) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "f_out", "tn"))
def _fused_conv_raw(xp, wc, *, kh, kw, f_out, tn):
    """xp: [B, Tp_padded, Fp, 4C] (Tp_padded = T_pad + kh - 1, T_pad % TT == 0);
    wc: [10, kh*kw, C, N_pad] -> [B, 4, T_pad, f_out, N_pad] stacked output."""
    bsz, tp, fp, c4 = xp.shape
    t_pad = tp - (kh - 1)
    n_pad = wc.shape[3]
    grid = (n_pad // tn, bsz, t_pad // _TT)

    kernel = functools.partial(_fused_kernel, kh=kh, kw=kw, f_out=f_out)
    flops = 2 * 10 * bsz * t_pad * fp * kh * kw * (c4 // 4) * n_pad
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (10, kh * kw, c4 // 4, tn),
                lambda j, b, i: (0, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, _TT, f_out, tn),
            lambda j, b, i: (b, 0, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 4, t_pad, f_out, n_pad), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((_TT + kh - 1, fp, c4), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + wc.size * wc.dtype.itemsize * (n_pad // tn)
            + 4 * bsz * t_pad * f_out * n_pad * xp.dtype.itemsize,
            transcendentals=0,
        ),
    )(wc, xp)


def _fused_conv_impl(x, w, padding):
    b, t, f, cin4 = x.shape
    _, kh, kw, cin, cout = w.shape
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("fused conv requires odd kernel sizes")

    if padding == "SAME":
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        t_out, f_out = t, f
        xsp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    elif padding == "VALID":
        t_out, f_out = t - kh + 1, f - kw + 1
        xsp = x
    else:
        raise ValueError(f"unsupported padding {padding!r}")

    # pad output-time to a TT multiple (extra rows read zero-padded input)
    t_pad = -(-t_out // _TT) * _TT
    extra_t = (t_pad + kh - 1) - xsp.shape[1]
    if extra_t > 0:
        xsp = jnp.pad(xsp, ((0, 0), (0, extra_t), (0, 0), (0, 0)))
    # pad the frequency rows to a sublane multiple so in-kernel row slices at
    # dt*Fp are aligned (see kernel docstring)
    xsp = _pad_dim(xsp, 2, 16)

    wc = jnp.einsum(
        "ascn,pa->pscn",
        w.reshape(4, kh * kw, cin, cout),
        jnp.asarray(W_COMBO, w.dtype),
    ).astype(x.dtype)  # [10, S, C, N]
    tn = min(256, -(-cout // 128) * 128)
    wc = _pad_dim(wc, 3, tn)

    out = _fused_conv_raw(xsp, wc, kh=kh, kw=kw, f_out=f_out, tn=tn)
    out = out[:, :, :t_out, :, :cout]  # [B, 4, T, F, N]
    return jnp.moveaxis(out, 1, 3).reshape(b, t_out, f_out, 4 * cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def qconv2d_fused(x: jnp.ndarray, w: jnp.ndarray, padding: str = "SAME"):
    """Fused direct Pallas quaternion conv2d (stride 1, odd kernels)."""
    return _fused_conv_impl(x, w, padding)


def _fused_fwd(x, w, padding):
    return _fused_conv_impl(x, w, padding), (x, w)


def _fused_bwd(padding, res, dy):
    from qasr.ops.qlinalg import qconv, qconv_fast10

    x, w = res
    # mathematically identical XLA backward; pick the measured-fastest path
    # (10-product adjoints fill MXU lanes only at >=128 q-channels — same
    # routing rule as qasr.models.layers.QConv)
    cin, cout = w.shape[-2], w.shape[-1]
    conv = qconv_fast10 if min(cin, cout) >= 128 else qconv
    _, vjp = jax.vjp(lambda x_, w_: conv(x_, w_, padding=padding), x, w)
    return vjp(dy)


qconv2d_fused.defvjp(_fused_fwd, _fused_bwd)
