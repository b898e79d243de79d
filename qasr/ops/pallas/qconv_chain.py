"""Chain-resident fused quaternion conv: the whole fat conv stack stays in
one margin-padded VMEM-friendly buffer layout across layers.

Why this exists (docs/performance.md round-3 accounting): the per-layer
Pallas kernel in qconv_ft runs its dots at >=97% of the rank-8 scheme's
speed of light, but loses end-to-end to the XLA stacked chain because every
layer pays an XLA pad at entry and a slice (+ separate bias/PReLU
elementwise pass) at exit — ~0.4 ms/layer of pure HBM traffic. This module
removes that traffic structurally:

* **One buffer layout for the whole chain**: activations live in
  ``[B, 4, Fp, TB, C]`` where ``Fp = F + kw - 1`` carries the SAME-padding
  frequency margins and ``TB = TT + T_pad + TT`` carries a leading and
  trailing TT-row time margin (TT = the kernel's time tile, so margin
  blocks are block-granular for the output BlockSpec). The chain pads ONCE
  at entry and slices ONCE at exit; between layers NOTHING moves.
* **Margins are re-zeroed by the kernel itself**: the time grid is extended
  by two steps that write zero blocks (the lead/tail margin), and the
  frequency margins + rows past ``t_valid`` are zeroed in the epilogue —
  so the buffer a layer writes is a valid SAME-padded input for the next.
* **The layer boundary is the PRE-activation** ``z``: bias lands in the
  kernel epilogue (on the f32 accumulators), and the split PReLU is fused
  into the NEXT layer's prologue (combos are formed from ``prelu(z)`` on
  the VPU). This choice makes the saved residual (``z``) exactly what the
  activation backward needs — no extra sign mask, no ``y = alpha*z``
  inversion that breaks at ``alpha == 0``.
* **Backward stays chain-resident too**: ``dz_{i-1} = g(z_{i-1}) ⊙
  convT(dz_i)`` runs as one kernel (same rotated-role decomposition as
  qconv_ft, with the PReLU gate fused into the recombination epilogue and
  the per-channel ``dalpha`` reduced across the grid into a second output).
  dW keeps the measured-best XLA correlation-conv formulation (94% of
  attainable; a Pallas dW loses to Mosaic's row-contracting dot_general —
  benchmarks/probe_dgt.py).

Reference parity: this computes exactly `bias + qconv(prelu(x))` per layer,
i.e. the reference's QuaternionConv2D + split PReLU tower (SURVEY.md §2a
C1/C4; mount empty — no file:line), at 8/16 of its MXU FLOPs.

Constraints (gated by ``supported()``): stride 1, SAME padding, odd kernels,
bf16 buffers, Cin % 128 == 0 and Cout % 128 == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.pallas.qconv_ft import (
    SCHEME8,
    SCHEME10,
    _ft_dw_impl,
    _round_up,
    _scaled,
    _Scheme,
)

_TT = 32   # time rows per tile; also the margin size (block-granular offsets)
_TN = 128  # output-channel tile (one MXU lane group)
_HALO = 8  # aligned halo rows DMA'd on each side of a tile window


def supported(cin: int, cout: int, kernel_size, padding, strides, dtype=None) -> bool:
    """Whether the chain-resident kernel handles this conv configuration.

    ``dtype`` (when given) must be bfloat16 — same Mosaic constraint as
    qconv_ft.supported; None skips the check for interpret-mode tests.
    """
    kh, kw = kernel_size
    return (
        padding == "SAME"
        and (strides is None or tuple(strides) == (1, 1))
        and kh % 2 == 1
        and kw % 2 == 1
        and kh <= 2 * _HALO + 1
        and cin % _TN == 0
        and cout % _TN == 0
        and (dtype is None or jnp.dtype(dtype) == jnp.bfloat16)
    )


# ---------------------------------------------------------------------------
# buffer geometry
# ---------------------------------------------------------------------------


def chain_entry(x_st: jnp.ndarray, kw: int) -> jnp.ndarray:
    """[B, 4, F, T, C] stacked -> the chain buffer [B, 4, Fp, TB, C].

    One XLA pad for the WHOLE chain: SAME frequency margins (pw per side)
    and TT-row time margins around T rounded up to a tile multiple. Valid
    t = 0 sits at buffer row TT.
    """
    b, _, f, t, c = x_st.shape
    pw = (kw - 1) // 2
    t_pad = max(_round_up(t, _TT), _TT)
    return jnp.pad(
        x_st,
        ((0, 0), (0, 0), (pw, pw), (_TT, t_pad - t + _TT), (0, 0)),
    )


def chain_exit(xp: jnp.ndarray, f: int, t: int, kw: int) -> jnp.ndarray:
    """Chain buffer -> [B, 4, F, T, C] stacked (single slice)."""
    pw = (kw - 1) // 2
    return xp[:, :, pw : pw + f, _TT : _TT + t, :]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(
    xp_hbm,    # [B, 4, Fp, TB, C] HBM (ANY): previous layer's z (or entry x)
    wc_hbm,    # [P, S, C, N] HBM (ANY): U-combined weights
    bias_ref,  # [4, TN] VMEM block (channel tile j)
    alpha_ref, # [4, C] VMEM (full): PReLU slopes of the PREVIOUS layer
    z_ref,     # out: [1, 4, Fp, TT, TN] VMEM block
    xbuf,      # scratch [2, 4, Fp, TT + 2*HALO, C]
    wbuf,      # scratch [P, S, C, TN]
    xsems,     # DMA sems [2]
    wsem,      # DMA sem
    *,
    kh: int,
    kw: int,
    f_out: int,
    t_valid: int,
    in_terms,
    out_terms,
    apply_prologue: bool,
):
    j = pl.program_id(0)
    b = pl.program_id(1)
    ig = pl.program_id(2)          # extended time grid: 0..ni+2*mb-1
    nj = pl.num_programs(0)
    nb = pl.num_programs(1)

    fp = xbuf.shape[2]
    cq = xbuf.shape[4]
    tn = wbuf.shape[3]
    n_prods = len(in_terms)
    tt = z_ref.shape[3]            # time tile (block T size; divides _TT)
    mb = _TT // tt                 # margin blocks per side
    ni = pl.num_programs(2) - 2 * mb
    pw = (kw - 1) // 2
    ph = (kh - 1) // 2
    m = f_out * tt

    out_coefs = [[0.0] * n_prods for _ in range(4)]
    for p in range(n_prods):
        for bo, coef in out_terms[p]:
            out_coefs[bo][p] = coef

    li = (j * nb + b) * (ni + 2 * mb) + ig
    is_compute = (ig >= mb) & (ig < mb + ni)
    ci = ig - mb                           # compute tile index
    lc = (j * nb + b) * ni + ci            # linear compute index
    total_c = nj * nb * ni
    slot = lax.rem(lc, 2)

    def x_dma(slot_, b_, ci_):
        # aligned halo window: rows [TT + ci*TT - HALO, TT + ci*TT + TT + HALO)
        return pltpu.make_async_copy(
            xp_hbm.at[b_, :, :, pl.ds(_TT + ci_ * tt - _HALO, tt + 2 * _HALO), :],
            xbuf.at[slot_],
            xsems.at[slot_],
        )

    w_dma = pltpu.make_async_copy(
        wc_hbm.at[:, :, :, pl.ds(j * tn, tn)], wbuf, wsem
    )

    @pl.when(li == 0)
    def _():
        x_dma(0, 0, 0).start()

    @pl.when((b == 0) & (ig == 0))
    def _():
        w_dma.start()
        w_dma.wait()

    # margin steps: write the zero lead/tail time blocks and do nothing else
    @pl.when(~is_compute)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    @pl.when(is_compute)
    def _():
        nlc = lc + 1
        ci2 = lax.rem(nlc, ni)
        b2 = lax.rem(nlc // ni, nb)

        @pl.when(nlc < total_c)
        def _():
            x_dma(1 - slot, b2, ci2).start()

        x_dma(slot, b, ci).wait()

        accp = [None] * n_prods
        for dt in range(kh):
            # window row of the first input row feeding output row 0 of this
            # tile for tap dt: HALO - ph + dt (see chain_entry geometry)
            r0 = _HALO - ph + dt
            comp = []
            for a in range(4):
                raw = xbuf[slot, a][:, r0 : r0 + tt, :]
                if apply_prologue:
                    al = alpha_ref[a, :].astype(raw.dtype)  # [C] lanes
                    # compare in f32: Mosaic has no bf16 vector cmpf
                    neg = raw.astype(jnp.float32) < 0
                    raw = jnp.where(neg, al[None, None, :] * raw, raw)
                comp.append(raw.reshape(fp * tt, cq))
            for p in range(n_prods):
                cmb = None
                for a, coef in in_terms[p]:
                    term = _scaled(comp[a], coef)
                    cmb = term if cmb is None else cmb + term
                for df in range(kw):
                    lhs = cmb[df * tt : df * tt + m]
                    prod = jnp.dot(
                        lhs,
                        wbuf[p, dt * kw + df],
                        preferred_element_type=jnp.float32,
                    )
                    accp[p] = prod if accp[p] is None else accp[p] + prod

        # rows past t_valid computed from entry padding must stay zero in the
        # buffer (they are the next layer's tail margin / SAME padding)
        trow = lax.broadcasted_iota(jnp.int32, (1, tt, 1), 1)
        tmask = (ci * tt + trow) < t_valid
        for bo in range(4):
            acc = None
            for p in range(n_prods):
                coef = out_coefs[bo][p]
                if coef == 0.0:
                    continue
                term = _scaled(accp[p], coef)
                acc = term if acc is None else acc + term
            acc = acc + bias_ref[bo, :].astype(jnp.float32)[None, :]
            acc = acc.reshape(f_out, tt, tn)
            acc = jnp.where(tmask, acc, 0.0).astype(z_ref.dtype)
            z_ref[0, bo, pw : pw + f_out] = acc
            if pw:
                zero_f = jnp.zeros((pw, tt, tn), z_ref.dtype)
                z_ref[0, bo, :pw] = zero_f
                z_ref[0, bo, pw + f_out :] = zero_f


def _dx_kernel(
    dzp_hbm,    # [B, 4, Fp, TB, N] HBM (ANY): cotangent of this layer's z
    wc_hbm,     # [P, S, N, C] HBM (ANY): flip-transposed U-combined weights
    zin_ref,    # [1, 4, Fp, TT, TN] VMEM block: the saved INPUT z tile
    alpha_ref,  # [4, TN] VMEM block (Cin tile j): PReLU slopes gating input
    dx_ref,     # out: [1, 4, Fp, TT, TN] VMEM block
    dalpha_ref, # out: [4, TN] f32 block (accumulated over b, i)
    xbuf,       # scratch [2, 4, Fp, TT + 2*HALO, N]
    wbuf,       # scratch [P, S, N, TN]
    xsems,
    wsem,
    *,
    kh: int,
    kw: int,
    f_out: int,
    t_valid: int,
    in_terms,
    out_terms,
    apply_prologue: bool,
):
    j = pl.program_id(0)
    b = pl.program_id(1)
    ig = pl.program_id(2)
    nj = pl.num_programs(0)
    nb = pl.num_programs(1)

    fp = xbuf.shape[2]
    cq = xbuf.shape[4]
    tn = wbuf.shape[3]
    n_prods = len(in_terms)
    tt = dx_ref.shape[3]           # dx runs a half-size time tile (VMEM)
    mb = _TT // tt
    ni = pl.num_programs(2) - 2 * mb
    pw = (kw - 1) // 2
    ph = (kh - 1) // 2
    m = f_out * tt

    out_coefs = [[0.0] * n_prods for _ in range(4)]
    for p in range(n_prods):
        for bo, coef in out_terms[p]:
            out_coefs[bo][p] = coef

    li = (j * nb + b) * (ni + 2 * mb) + ig
    is_compute = (ig >= mb) & (ig < mb + ni)
    ci = ig - mb
    lc = (j * nb + b) * ni + ci
    total_c = nj * nb * ni
    slot = lax.rem(lc, 2)

    def x_dma(slot_, b_, ci_):
        return pltpu.make_async_copy(
            dzp_hbm.at[b_, :, :, pl.ds(_TT + ci_ * tt - _HALO, tt + 2 * _HALO), :],
            xbuf.at[slot_],
            xsems.at[slot_],
        )

    w_dma = pltpu.make_async_copy(
        wc_hbm.at[:, :, :, pl.ds(j * tn, tn)], wbuf, wsem
    )

    @pl.when(li == 0)
    def _():
        x_dma(0, 0, 0).start()

    @pl.when((b == 0) & (ig == 0))
    def _():
        w_dma.start()
        w_dma.wait()
        dalpha_ref[...] = jnp.zeros(dalpha_ref.shape, dalpha_ref.dtype)

    @pl.when(~is_compute)
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    @pl.when(is_compute)
    def _():
        nlc = lc + 1
        ci2 = lax.rem(nlc, ni)
        b2 = lax.rem(nlc // ni, nb)

        @pl.when(nlc < total_c)
        def _():
            x_dma(1 - slot, b2, ci2).start()

        x_dma(slot, b, ci).wait()

        accp = [None] * n_prods
        for dt in range(kh):
            r0 = _HALO - ph + dt
            comp = [
                xbuf[slot, a][:, r0 : r0 + tt, :].reshape(fp * tt, cq)
                for a in range(4)
            ]
            for p in range(n_prods):
                cmb = None
                for a, coef in in_terms[p]:
                    term = _scaled(comp[a], coef)
                    cmb = term if cmb is None else cmb + term
                for df in range(kw):
                    lhs = cmb[df * tt : df * tt + m]
                    prod = jnp.dot(
                        lhs,
                        wbuf[p, dt * kw + df],
                        preferred_element_type=jnp.float32,
                    )
                    accp[p] = prod if accp[p] is None else accp[p] + prod

        trow = lax.broadcasted_iota(jnp.int32, (1, tt, 1), 1)
        tmask = (ci * tt + trow) < t_valid
        for bo in range(4):
            acc = None
            for p in range(n_prods):
                coef = out_coefs[bo][p]
                if coef == 0.0:
                    continue
                term = _scaled(accp[p], coef)
                acc = term if acc is None else acc + term
            acc = acc.reshape(f_out, tt, tn)
            acc = jnp.where(tmask, acc, 0.0)
            if apply_prologue:
                # fuse the PReLU backward: dz_in = g(z_in) * dpost, with
                # dalpha accumulating dpost * z_in over the negative part.
                # z margins and masked rows are exactly 0, so the z < 0
                # condition already confines both to the valid region.
                z_tile = zin_ref[0, bo, pw : pw + f_out].astype(jnp.float32)
                neg = z_tile < 0
                al = alpha_ref[bo, :].astype(jnp.float32)
                dalpha_ref[bo, :] = dalpha_ref[bo, :] + jnp.sum(
                    jnp.where(neg, acc * z_tile, 0.0), axis=(0, 1)
                )
                acc = jnp.where(neg, al[None, None, :] * acc, acc)
            dx_ref[0, bo, pw : pw + f_out] = acc.astype(dx_ref.dtype)
            if pw:
                zero_f = jnp.zeros((pw, tt, tn), dx_ref.dtype)
                dx_ref[0, bo, :pw] = zero_f
                dx_ref[0, bo, pw + f_out :] = zero_f


# ---------------------------------------------------------------------------
# jit-level wrappers
# ---------------------------------------------------------------------------


def _common_cost(n_prods, s, bsz, t_pad, f_out, cq, n, nj):
    return pl.CostEstimate(
        flops=2 * n_prods * s * bsz * t_pad * f_out * cq * n,
        bytes_accessed=(
            bsz * 4 * (f_out + 2) * (t_pad + 2 * _TT) * cq * 2 * nj
            + n_prods * s * cq * n * 2
            + 4 * bsz * t_pad * f_out * n * 2
        ),
        transcendentals=0,
    )


# NOTE: deliberately NOT wrapped in a module-level jax.jit — a cached jit
# around a pallas_call deadlocks when differentiated twice with different
# argnums in one process (observed under interpret mode, round 4). These are
# always called inside the train step's outer jit, so nothing is lost.
def _fwd_call(xp, wc, bias2, alpha2, *, kh, kw, f_out, t_valid,
              in_terms, out_terms, prologue, tt=_TT):
    bsz, _, fp, tb, cq = xp.shape
    t_pad = tb - 2 * _TT
    n_prods, s, _, n = wc.shape
    ni = t_pad // tt
    mb = _TT // tt
    grid = (n // _TN, bsz, ni + 2 * mb)
    kernel = functools.partial(
        _fwd_kernel,
        kh=kh, kw=kw, f_out=f_out, t_valid=t_valid,
        in_terms=in_terms, out_terms=out_terms, apply_prologue=prologue,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((4, _TN), lambda j, b, i: (0, j)),
            pl.BlockSpec((4, cq), lambda j, b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, fp, tt, _TN), lambda j, b, i: (b, 0, 0, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 4, fp, tb, n), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4, fp, tt + 2 * _HALO, cq), xp.dtype),
            pltpu.VMEM((n_prods, s, cq, _TN), wc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=_common_cost(n_prods, s, bsz, t_pad, f_out, cq, n,
                                   n // _TN),
    )(xp, wc, bias2, alpha2)


def _dx_call(dzp, wc, zin, alpha2, *, kh, kw, f_out, t_valid,
             in_terms, out_terms, prologue, tt=_TT // 2):
    # dx defaults to a half-size time tile: it carries one more pipelined
    # stream (the saved z tiles for the fused PReLU backward) than the fwd
    # kernel, and the full-TT variant measures 744 KB over the 16 MB VMEM
    # budget at flagship shapes. dx stays compute-bound, so the extra halo
    # re-reads hide under the dots.
    bsz, _, fp, tb, n = dzp.shape
    t_pad = tb - 2 * _TT
    n_prods, s, _, cq = wc.shape
    ni = t_pad // tt
    mb = _TT // tt
    grid = (cq // _TN, bsz, ni + 2 * mb)
    kernel = functools.partial(
        _dx_kernel,
        kh=kh, kw=kw, f_out=f_out, t_valid=t_valid,
        in_terms=in_terms, out_terms=out_terms, apply_prologue=prologue,
    )
    dx, dalpha = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((1, 4, fp, tt, _TN), lambda j, b, i: (b, 0, 0, i, j)),
            pl.BlockSpec((4, _TN), lambda j, b, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, fp, tt, _TN), lambda j, b, i: (b, 0, 0, i, j)),
            pl.BlockSpec((4, _TN), lambda j, b, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 4, fp, tb, cq), dzp.dtype),
            jax.ShapeDtypeStruct((4, cq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, fp, tt + 2 * _HALO, n), dzp.dtype),
            pltpu.VMEM((n_prods, s, n, _TN), wc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=_common_cost(n_prods, s, bsz, t_pad, f_out, n, cq,
                                   cq // _TN),
    )(dzp, wc, zin, alpha2)
    return dx, dalpha


# ---------------------------------------------------------------------------
# the layer op (custom VJP)
# ---------------------------------------------------------------------------


def _fwd_impl(xp, w, bias, alpha, scheme: _Scheme, t_valid: int,
              prologue: bool):
    """xp: chain buffer [B, 4, Fp, TB, Cin]; w: [4, kh, kw, Cin, Cout];
    bias: [4*Cout]; alpha: [4*Cin] (previous layer's PReLU slopes).
    Returns this layer's pre-activation z in the same buffer layout."""
    _, kh, kw, cin, cout = w.shape
    fp = xp.shape[2]
    f_out = fp - (kw - 1)
    wc = jnp.einsum(
        "askn,pa->pskn",
        w.reshape(4, kh * kw, cin, cout),
        jnp.asarray(scheme.u, w.dtype),
    ).astype(xp.dtype)
    bias2 = bias.reshape(4, cout).astype(jnp.float32)
    alpha2 = alpha.reshape(4, cin).astype(xp.dtype)
    return _fwd_call(
        xp, wc, bias2, alpha2,
        kh=kh, kw=kw, f_out=f_out, t_valid=t_valid,
        in_terms=scheme.fwd_in, out_terms=scheme.fwd_out, prologue=prologue,
    )


def _dx_impl(dzp, w, xp, alpha, scheme: _Scheme, t_valid: int,
             prologue: bool):
    _, kh, kw, cin, cout = w.shape
    fp = dzp.shape[2]
    f_out = fp - (kw - 1)
    wc = jnp.einsum(
        "ahwkn,pa->phwnk", w, jnp.asarray(scheme.u, w.dtype)
    )
    wc = wc[:, ::-1, ::-1].reshape(
        scheme.n_prods, kh * kw, cout, cin
    ).astype(dzp.dtype)
    alpha2 = alpha.reshape(4, cin).astype(dzp.dtype)
    return _dx_call(
        dzp, wc, xp, alpha2,
        kh=kh, kw=kw, f_out=f_out, t_valid=t_valid,
        in_terms=scheme.dx_in, out_terms=scheme.dx_out, prologue=prologue,
    )


def _make_chain_layer(scheme: _Scheme):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def layer(xp, w, bias, alpha, t_valid, prologue):
        return _fwd_impl(xp, w, bias, alpha, scheme, t_valid, prologue)

    def fwd(xp, w, bias, alpha, t_valid, prologue):
        z = _fwd_impl(xp, w, bias, alpha, scheme, t_valid, prologue)
        return z, (xp, w, alpha)

    def bwd(t_valid, prologue, res, dzp):
        xp, w, alpha = res
        _, kh, kw, cin, cout = w.shape
        fp = xp.shape[2]
        pw = (kw - 1) // 2
        f = fp - 2 * pw
        dxp, dalpha = _dx_impl(dzp, w, xp, alpha, scheme, t_valid, prologue)
        # dW: the measured-best XLA correlation formulation on the valid
        # slices; the slice + PReLU fuse into the conv's input read.
        x_val = chain_exit(xp, f, t_valid, kw)
        if prologue:
            a4 = alpha.reshape(4, 1, 1, cin).astype(x_val.dtype)
            x_val = jnp.where(x_val >= 0, x_val, a4 * x_val)
        dy_val = chain_exit(dzp, f, t_valid, kw)
        dw = _ft_dw_impl(x_val, dy_val, w.shape, w.dtype, scheme)
        # bias: every valid output element adds it once; dzp is zero on
        # margins and masked rows, so the plain sum is the masked sum.
        # (bias shares w's dtype — chain_layer casts all op inputs together.)
        db = dzp.astype(jnp.float32).sum(axis=(0, 3)).sum(axis=1).reshape(-1)
        dalpha = dalpha.reshape(-1).astype(alpha.dtype)
        if not prologue:
            dalpha = jnp.zeros_like(dalpha)
        return dxp, dw, db.astype(w.dtype), dalpha

    layer.defvjp(fwd, bwd)
    return layer


_CHAIN8 = _make_chain_layer(SCHEME8)
_CHAIN10 = _make_chain_layer(SCHEME10)


def chain_layer(xp, w, bias, alpha, *, t_valid: int, scheme: str = "fast8"):
    """One chain-resident fused layer: ``z = qconv(prelu_alpha(xp), w) + b``.

    ``xp``/result: the padded chain buffer (see chain_entry). ``alpha`` is
    the PReLU slope vector of the PREVIOUS layer (``[4*Cin]``); pass None
    for the first chain layer (its input is already activated) — the
    prologue is skipped entirely.
    """
    s = {"fast8": _CHAIN8, "fast10": _CHAIN10}[scheme]
    prologue = alpha is not None
    if alpha is None:
        alpha = jnp.ones((4 * xp.shape[-1],), xp.dtype)
    return s(xp, w, bias, alpha, int(t_valid), prologue)
