"""Quaternion conv2d in the frequency-major stacked layout — the XLA stacked
conv paths (the production default) and the fused Pallas kernel (R1).

Native-delegation obligation R1 (SURVEY.md §2b): the reference's hot op is a
real conv2d on the 4x-expanded block kernel (16 block products; SURVEY.md
§3.2, mount empty). Everything here exploits a layout chosen around the
TPU's tiling rules plus reduced-product bilinear schemes (rank-10 / rank-8,
quaternion.py); the measured production path is `qconv_fast{10,8}_stacked`
(plain XLA convs + a custom VJP whose dx is a PLAIN quaternion conv with
the conjugate-adjoint kernel — see _conj_transpose_w),
and `qconv2d_ft{,8}_stacked` is the fused Pallas kernel — its dots alone
run at 97% of scheme speed-of-light, the quantified proof of attainable in
docs/performance.md, and the fallback if a shape regime hits an XLA
lowering cliff. Design of the Pallas kernel:

* **F-major, component-stacked activations** ``[B, 4, F, T, C]``: the
  frequency taps (df) are *leading-dimension* slices of the flattened (f, t)
  row space — free, no sublane relayout — because T tiles are a sublane
  multiple; the component slices are buffer indexes instead of lane slices;
  and the layout is identical on input and output, so a stack of conv layers
  chains with ZERO repacking between layers (the reference-layout wrapper
  `qconv2d_ft` transposes once at entry/exit for parity tests).
* **Zero padding waste**: each MXU dot consumes exactly ``f_out * TT`` rows;
  nothing is computed for F pad columns.
* One halo-window DMA per (batch, time) tile, manually double-buffered; the
  kh time-tap shifts are in-VMEM sublane slices whose relayout cost measures
  as hidden under the MXU dots (benchmarks: ablation modes within noise of
  the dots-only skeleton).
* The scheme's input combos are formed on the VPU once per (dt, product)
  and reused across the kw frequency taps; the kh*kw*P dots accumulate into
  per-product f32 sums, recombined to the 4 components once per tile (keeps
  VPU work under the MXU time even for the rank-8 scheme's dense O8).
* The weight-combination tensor ``wc [P, S, C, TN]`` stays resident in VMEM
  across the whole (batch, time) grid — weights are never 4x-expanded.

The same kernel body computes dx: a transposed quaternion conv is the same
bilinear scheme with the roles rotated — input combos from the scheme's
output matrix columns, weights flip-transposed (`wc_dx`), output
recombination from the input matrix columns. dW delegates to the
`jax.linear_transpose` of the XLA stacked conv (P correlation convs,
contraction dim B*F*T — already MXU-shaped, no transposes).

Constraints (wrapper-enforced; the layer router falls back to XLA otherwise):
stride 1, odd kernels, SAME padding, bf16 compute, C % 128 == 0 and
Cout % 128 == 0 (MXU lane tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.quaternion import O8, OUT_COMBO, U8, V8, W_COMBO, X_COMBO

_TT = 32   # time rows per tile (sublane multiple for bf16)
_TN = 128  # output-channel tile (one MXU lane group)


class _Scheme:
    """A bilinear decomposition of the Hamilton product:
    ``y_b = Σ_p O[b,p] · (Σ_a U[p,a] w_a) ⊛ (Σ_a V[p,a] x_a)``.

    Term tables are (index, coefficient) tuples — hashable statics for the
    kernel. The transposed conv (dx) is the same structure with roles
    rotated: input combos from O's columns, outputs from V's columns,
    weights flip-transposed (still U-combos).
    """

    def __init__(self, name, u, v, o):
        self.name = name
        self.u = np.asarray(u, np.float64)       # [P, 4] weight-side
        v = np.asarray(v, np.float64)            # [P, 4] input-side
        o = np.asarray(o, np.float64)            # [4, P] output-side
        p = self.u.shape[0]
        self.n_prods = p
        self.fwd_in = tuple(
            tuple((int(a), float(v[q, a])) for a in range(4) if v[q, a] != 0)
            for q in range(p)
        )
        self.fwd_out = tuple(
            tuple((int(b), float(o[b, q])) for b in range(4) if o[b, q] != 0)
            for q in range(p)
        )
        self.dx_in = self.fwd_out
        self.dx_out = self.fwd_in
        # dense forms of the (sparse) term tables, for formulations that
        # contract against the full matrices (grouped conv, dense ops)
        self.v_mat = v.copy()          # [P, 4] input-side
        self.o_mat = o.copy()          # [4, P] output-side


SCHEME10 = _Scheme("fast10", W_COMBO, X_COMBO, OUT_COMBO)
SCHEME8 = _Scheme("fast8", U8, V8, O8)


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


def _pad8(v: int) -> int:
    """Halo rows rounded up so the DMA window length stays 8-row aligned."""
    return _round_up(v, 8)


def _scaled(val, coef):
    """coef * val with ±1 shortcuts (coef is a static Python float)."""
    if coef == 1.0:
        return val
    if coef == -1.0:
        return -val
    return val * val.dtype.type(coef)


def _ft_kernel(
    xp_hbm,   # [B, 4, Fp, T_pad + pad8(kh-1), C] in HBM (ANY)
    wc_hbm,   # [P, S, C, N_pad] in HBM (ANY)
    o_ref,    # [1, 4, f_out, TT, TN] VMEM block
    xbuf,     # scratch [2, 4, Fp, TT + pad8(kh-1), C]
    wbuf,     # scratch [P, S, C, TN]
    xsems,    # DMA sems [2]
    wsem,     # DMA sem
    *,
    kh: int,
    kw: int,
    f_out: int,
    in_terms,
    out_terms,
):
    j = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    nj = pl.num_programs(0)
    nb = pl.num_programs(1)
    ni = pl.num_programs(2)

    fp = xbuf.shape[2]
    win = xbuf.shape[3]
    cq = xbuf.shape[4]
    tn = wbuf.shape[3]
    n_prods = len(in_terms)
    tt = win - _pad8(kh - 1)
    m = f_out * tt

    out_coefs = [[0.0] * n_prods for _ in range(4)]
    for p in range(n_prods):
        for bo, coef in out_terms[p]:
            out_coefs[bo][p] = coef

    li = (j * nb + b) * ni + i
    total = nj * nb * ni
    slot = lax.rem(li, 2)

    def x_dma(slot_, b_, i_):
        # one halo window [4, Fp, TT + pad8(kh-1), C] per tile: DMA offsets
        # on the second-minor T dim must be 8-aligned, so the window starts
        # at i*TT and the kh time-tap shifts are in-VMEM row slices below
        return pltpu.make_async_copy(
            xp_hbm.at[b_, :, :, pl.ds(i_ * tt, win), :],
            xbuf.at[slot_],
            xsems.at[slot_],
        )

    # weights: refresh only when the N tile changes (start of each j pass);
    # exposed twice per conv — negligible, and it buys single-buffered
    # residency (an auto-pipelined BlockSpec would double-buffer 2x the VMEM).
    w_dma = pltpu.make_async_copy(
        wc_hbm.at[:, :, :, pl.ds(j * tn, tn)], wbuf, wsem
    )

    @pl.when(li == 0)
    def _():
        x_dma(0, b, i).start()

    @pl.when((b == 0) & (i == 0))
    def _():
        w_dma.start()
        w_dma.wait()

    nli = li + 1
    i2 = lax.rem(nli, ni)
    t2 = nli // ni
    b2 = lax.rem(t2, nb)

    @pl.when(nli < total)
    def _():
        x_dma(1 - slot, b2, i2).start()

    x_dma(slot, b, i).wait()

    # per-PRODUCT f32 accumulators: one plain add per dot; the (possibly
    # dense) output recombination runs ONCE per tile in the epilogue instead
    # of per (dt, df) tap — keeps VPU work well under the MXU dot time even
    # for the rank-8 scheme's dense O8
    accp = [None] * n_prods
    for dt in range(kh):
        # time-tap shift: an unaligned sublane slice (Mosaic relayout roll);
        # measured hidden under the MXU dots at these shapes
        comp = [
            xbuf[slot, a][:, dt : dt + tt, :].reshape(fp * tt, cq)
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

    for bo in range(4):
        acc = None
        for p in range(n_prods):
            coef = out_coefs[bo][p]
            if coef == 0.0:
                continue
            term = _scaled(accp[p], coef)
            acc = term if acc is None else acc + term
        o_ref[0, bo] = acc.reshape(f_out, tt, tn).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kh", "kw", "f_out", "in_terms", "out_terms")
)
def _ft_conv_raw(xp, wc, *, kh, kw, f_out, in_terms, out_terms):
    """xp: [B, 4, Fp, T_pad + pad8(kh-1), C] (T_pad % TT == 0);
    wc: [P, kh*kw, C, N_pad] -> stacked [B, 4, f_out, T_pad, N_pad]."""
    bsz, _, fp, tp_ext, cq = xp.shape
    t_pad = tp_ext - _pad8(kh - 1)
    n_prods, s, _, n_pad = wc.shape
    grid = (n_pad // _TN, bsz, t_pad // _TT)

    kernel = functools.partial(
        _ft_kernel,
        kh=kh,
        kw=kw,
        f_out=f_out,
        in_terms=in_terms,
        out_terms=out_terms,
    )
    flops = 2 * n_prods * s * bsz * t_pad * f_out * cq * n_pad
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, f_out, _TT, _TN),
            lambda j, b, i: (b, 0, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, 4, f_out, t_pad, n_pad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, fp, _TT + _pad8(kh - 1), cq), xp.dtype),
            pltpu.VMEM((n_prods, s, cq, _TN), wc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize * (n_pad // _TN)
            + wc.size * wc.dtype.itemsize
            + 4 * bsz * t_pad * f_out * n_pad * xp.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wc)


def _prep_input(x_st, kh, kw):
    """SAME-pad F and T and round T up to tile + aligned halo window. One
    XLA pad pass (fuses with the producing op); the kernel's per-tile DMA
    windows then start 8-row aligned as Mosaic requires.

    x_st: [B, 4, F, T, C] -> [B, 4, F + kw - 1, T_pad + pad8(kh - 1), C].
    """
    b, _, f, t, cq = x_st.shape
    pw = (kw - 1) // 2
    ph = (kh - 1) // 2
    t_pad = max(_round_up(t, _TT), _TT)
    return jnp.pad(
        x_st,
        (
            (0, 0),
            (0, 0),
            (pw, pw),
            (ph, t_pad + _pad8(kh - 1) - t - ph),
            (0, 0),
        ),
    )


def supported(cin: int, cout: int, kernel_size, padding, strides, dtype=None) -> bool:
    """Whether the fused F-major kernel handles this conv configuration.

    ``dtype`` (when given) must be bfloat16: f32 inputs hit a multi-minute
    Mosaic compile blowup on the real TPU, so callers should route non-bf16
    through the XLA stacked path instead. None skips the check (interpret-
    mode tests run the kernel in f32 deliberately).
    """
    kh, kw = kernel_size
    return (
        padding == "SAME"
        and (strides is None or tuple(strides) == (1, 1))
        and kh % 2 == 1
        and kw % 2 == 1
        and cin % 128 == 0
        and cout % 128 == 0
        and (dtype is None or jnp.dtype(dtype) == jnp.bfloat16)
    )


def _ft_fwd_impl(x_st, w, scheme: _Scheme):
    """x_st: [B, 4, F, T, Cin] stacked F-major; w: [4, kh, kw, Cin, Cout]."""
    b, _, f, t, cin = x_st.shape
    _, kh, kw, _, cout = w.shape
    xp = _prep_input(x_st, kh, kw)

    wc = jnp.einsum(
        "askn,pa->pskn",
        w.reshape(4, kh * kw, cin, cout),
        jnp.asarray(scheme.u, w.dtype),
    ).astype(x_st.dtype)  # [P, S, C, N]
    n_pad = _round_up(cout, _TN)
    if n_pad != cout:
        wc = jnp.pad(wc, ((0, 0), (0, 0), (0, 0), (0, n_pad - cout)))

    out = _ft_conv_raw(
        xp,
        wc,
        kh=kh,
        kw=kw,
        f_out=f,
        in_terms=scheme.fwd_in,
        out_terms=scheme.fwd_out,
    )  # [B, 4, F, T_pad, N_pad]
    return out[:, :, :, :t, :cout]


def _ft_dx_impl(dy_st, w, scheme: _Scheme):
    """Transposed conv: dy [B, 4, F, T, Cout] -> dx [B, 4, F, T, Cin]."""
    b, _, f, t, _ = dy_st.shape
    _, kh, kw, cin, cout = w.shape
    dyp = _prep_input(dy_st, kh, kw)

    # flip taps, swap Cin/Cout: wc_dx[p] = flip_s(Wc_p)^T
    wc = jnp.einsum(
        "ahwkn,pa->phwnk", w, jnp.asarray(scheme.u, w.dtype)
    )  # [P, kh, kw, N, C]
    wc = wc[:, ::-1, ::-1].reshape(
        scheme.n_prods, kh * kw, cout, cin
    ).astype(dy_st.dtype)
    c_pad = _round_up(cin, _TN)
    if c_pad != cin:
        wc = jnp.pad(wc, ((0, 0), (0, 0), (0, 0), (0, c_pad - cin)))

    out = _ft_conv_raw(
        dyp,
        wc,
        kh=kh,
        kw=kw,
        f_out=f,
        in_terms=scheme.dx_in,
        out_terms=scheme.dx_out,
    )
    return out[:, :, :, :t, :cin]


def _qconv_stacked_xla(x_st, w, scheme: _Scheme, padding="SAME"):
    """XLA reduced-product quaternion conv on the stacked F-major layout.

    Consumes ``[B, 4, F, T, C]`` directly (component slices are leading-dim
    indexing, no packed-layout reshapes). Used as the dW transpose source
    and as the XLA parity twin of the Pallas kernel.
    """
    _, kh, kw, cin, cout = w.shape
    # w's kernel dims are (time, freq); the stacked layout is (F, T)-major,
    # so swap them to match conv dimension numbers H=F, W=T
    wc = jnp.einsum(
        "a...kn,pa->p...kn",
        jnp.swapaxes(w, 1, 2),
        jnp.asarray(scheme.u, w.dtype),
    ).astype(x_st.dtype)  # [P, kw, kh, Cin, Cout]
    sample = x_st[:, 0]
    dn = lax.conv_dimension_numbers(
        sample.shape, wc.shape[1:], ("NHWC", "HWIO", "NHWC")
    )

    prods = []
    for p in range(scheme.n_prods):
        xc = None
        for a, coef in scheme.fwd_in[p]:
            term = _scaled(x_st[:, a], coef)
            xc = term if xc is None else xc + term
        prods.append(
            lax.conv_general_dilated(
                xc, wc[p], (1, 1), padding, dimension_numbers=dn
            )
        )
    outs = []
    for bo in range(4):
        acc = None
        for p, coef in (
            (p, coef)
            for p in range(scheme.n_prods)
            for b_, coef in scheme.fwd_out[p]
            if b_ == bo
        ):
            term = _scaled(prods[p], coef)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=1)  # [B, 4, F, T, Cout]


def _conj_transpose_w(w):
    """[4, kh, kw, Cin, Cout] -> the adjoint kernel [4, kh, kw, Cout, Cin].

    The adjoint of quaternion left-multiplication is multiplication by the
    CONJUGATE (<w⊗x, y> = <x, conj(w)⊗y> in the real inner product), so the
    transposed conv is a PLAIN quaternion conv with conj(w), channel dims
    swapped and spatial taps flipped — which means dx can use the standard
    scheme with its 2-SPARSE input combos instead of the dense rotated-role
    O-column combos (measured ~3% faster dx; docs/performance.md).
    """
    wc = jnp.stack([w[0], -w[1], -w[2], -w[3]])[:, ::-1, ::-1]
    return jnp.swapaxes(wc, -1, -2)


def _make_stacked_xla(scheme: _Scheme):
    @jax.custom_vjp
    def conv(x_st, w):
        return _qconv_stacked_xla(x_st, w, scheme)

    def fwd(x_st, w):
        return _qconv_stacked_xla(x_st, w, scheme), (x_st, w)

    def bwd(res, dy):
        x_st, w = res
        dx = _qconv_stacked_xla(dy, _conj_transpose_w(w), scheme, "SAME")
        dw = _ft_dw_impl(x_st, dy, w.shape, w.dtype, scheme)
        return dx, dw

    conv.defvjp(fwd, bwd)
    return conv


_FAST10_STACKED_SAME = _make_stacked_xla(SCHEME10)
_FAST8_STACKED_SAME = _make_stacked_xla(SCHEME8)


def _use_custom_vjp(w, padding):
    # the rotated-role forward-conv dx only equals the true transpose when
    # SAME padding is symmetric, i.e. odd kernels; otherwise fall back to
    # autodiff of the plain formulation
    return padding == "SAME" and w.shape[1] % 2 == 1 and w.shape[2] % 2 == 1


def qconv_fast10_stacked(x_st, w, *, padding="SAME"):
    """XLA 10-product quaternion conv, stacked F-major layout."""
    if _use_custom_vjp(w, padding):
        return _FAST10_STACKED_SAME(x_st, w)
    return _qconv_stacked_xla(x_st, w, SCHEME10, padding)


def qconv_fast8_stacked(x_st, w, *, padding="SAME"):
    """XLA rank-8 quaternion conv, stacked F-major layout (8/16 the MXU
    FLOPs of the reference's expanded conv; see quaternion.py U8/V8/O8)."""
    if _use_custom_vjp(w, padding):
        return _FAST8_STACKED_SAME(x_st, w)
    return _qconv_stacked_xla(x_st, w, SCHEME8, padding)


def _ft_dw_impl(x_st, dy_st, w_shape, w_dtype, scheme: _Scheme):
    """dW via the linear transpose of the XLA reduced-product conv on the
    stacked layout (P correlation convs whose contraction dim is B*F*T)."""
    w_abstract = jax.ShapeDtypeStruct(w_shape, w_dtype)
    (dw,) = jax.linear_transpose(
        lambda w_: _qconv_stacked_xla(x_st, w_, scheme), w_abstract
    )(dy_st)
    return dw


def _make_fused(scheme: _Scheme):
    @jax.custom_vjp
    def fused(x_st: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        return _ft_fwd_impl(x_st, w, scheme)

    def fwd(x_st, w):
        return _ft_fwd_impl(x_st, w, scheme), (x_st, w)

    def bwd(res, dy):
        x_st, w = res
        dx = _ft_dx_impl(dy, w, scheme)
        dw = _ft_dw_impl(x_st, dy, w.shape, w.dtype, scheme)
        return dx, dw

    fused.defvjp(fwd, bwd)
    return fused


#: Fused F-major Pallas quaternion conv2d (stride 1, SAME, odd kernels).
#: x_st: ``[B, 4, F, T, Cin]`` component-stacked, frequency-major;
#: w: ``[4, kh, kw, Cin, Cout]``. Returns the same layout, so conv stacks
#: chain with no repacking. 10-product scheme.
qconv2d_ft_stacked = _make_fused(SCHEME10)

#: Same kernel with the rank-8 scheme (2.0x MXU FLOP cut vs the reference's
#: expanded conv).
qconv2d_ft8_stacked = _make_fused(SCHEME8)


def pack_to_stacked(x_ft: jnp.ndarray) -> jnp.ndarray:
    """[B, F, T, 4C] packed -> [B, 4, F, T, C] stacked (one XLA transpose;
    in models this happens once at conv-stack entry, not per layer)."""
    b, f, t, c4 = x_ft.shape
    return jnp.moveaxis(x_ft.reshape(b, f, t, 4, c4 // 4), 3, 1)


def stacked_to_pack(x_st: jnp.ndarray) -> jnp.ndarray:
    """[B, 4, F, T, C] stacked -> [B, F, T, 4C] packed."""
    b, _, f, t, cq = x_st.shape
    return jnp.moveaxis(x_st, 1, 3).reshape(b, f, t, 4 * cq)


def qconv2d_ft(x_ft: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reference-layout wrapper: packed F-major ``[B, F, T, 4Cin]`` in/out.

    Pays a packed<->stacked transpose on each side; model code should chain
    `qconv2d_ft_stacked` instead and convert once per conv stack.
    """
    return stacked_to_pack(qconv2d_ft_stacked(pack_to_stacked(x_ft), w))


# ---------------------------------------------------------------------------
# Round-4: single-dispatch grouped formulation of the reduced-product conv.
# The 8 product convs of the stacked scheme become ONE XLA conv with
# feature_group_count=P (input combos packed to [B, F, T, P*Cin] lanes,
# weights [kw, kh, Cin, P*Cout]); measured 1.4x the 8-dispatch form at
# C=256 fwd+bwd in benchmarks/probe_grouped.py — one conv call amortizes
# XLA's per-conv emitter overhead while every group keeps full 128-lane
# output tiles. Below 128 channels grouping does NOT help (same probe, 0.33x
# block at C=64) — the >=128 entry gate is unchanged.
# ---------------------------------------------------------------------------


def _qconv_stacked_grouped_xla(x_st, w, scheme: _Scheme, padding="SAME"):
    """Grouped-conv formulation on the stacked F-major layout.

    x_st: [B, 4, F, T, Cin]; w: [4, kh, kw, Cin, Cout] -> [B, 4, F, T, Cout].
    """
    b, _, f, t, cin = x_st.shape
    _, kh, kw, _, cout = w.shape
    p = scheme.n_prods
    wc = jnp.einsum(
        "a...kn,pa->p...kn",
        jnp.swapaxes(w, 1, 2),
        jnp.asarray(scheme.u, w.dtype),
    ).astype(x_st.dtype)  # [P, kw, kh, Cin, Cout]
    wg = jnp.moveaxis(wc, 0, 3).reshape(kw, kh, cin, p * cout)
    xc = jnp.einsum(
        "baftc,pa->bftpc", x_st, jnp.asarray(scheme.v_mat, x_st.dtype)
    ).reshape(b, f, t, p * cin)
    dn = lax.conv_dimension_numbers(
        (b, f, t, p * cin), (kw, kh, cin, p * cout), ("NHWC", "HWIO", "NHWC")
    )
    out = lax.conv_general_dilated(
        xc, wg, (1, 1), padding, dimension_numbers=dn, feature_group_count=p
    ).reshape(b, f, t, p, cout)
    y = jnp.einsum(
        "bftpc,qp->bqftc", out, jnp.asarray(scheme.o_mat, out.dtype)
    )
    return y.astype(x_st.dtype)


def _qconv_stacked_grouped_dx_xla(dy_st, w, scheme: _Scheme):
    """Rotated-role dx as ONE grouped conv (SAME stride-1 odd kernels)."""
    b, _, f, t, cout = dy_st.shape
    _, kh, kw, cin, _ = w.shape
    p = scheme.n_prods
    wc = jnp.einsum(
        "ahwkn,pa->pwhnk", w, jnp.asarray(scheme.u, w.dtype)
    )  # [P, kw, kh, Cout, Cin]
    wc = wc[:, ::-1, ::-1].astype(dy_st.dtype)
    wg = jnp.moveaxis(wc, 0, 3).reshape(kw, kh, cout, p * cin)
    dyc = jnp.einsum(
        "bqftc,qp->bftpc", dy_st, jnp.asarray(scheme.o_mat, dy_st.dtype)
    ).reshape(b, f, t, p * cout)
    dn = lax.conv_dimension_numbers(
        (b, f, t, p * cout), (kw, kh, cout, p * cin), ("NHWC", "HWIO", "NHWC")
    )
    out = lax.conv_general_dilated(
        dyc, wg, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=p
    ).reshape(b, f, t, p, cin)
    dx = jnp.einsum(
        "bftpc,pa->baftc", out, jnp.asarray(scheme.v_mat, out.dtype)
    )
    return dx.astype(dy_st.dtype)


def _make_stacked_grouped(scheme: _Scheme):
    @jax.custom_vjp
    def conv(x_st, w):
        return _qconv_stacked_grouped_xla(x_st, w, scheme)

    def fwd(x_st, w):
        return _qconv_stacked_grouped_xla(x_st, w, scheme), (x_st, w)

    def bwd(res, dy):
        x_st, w = res
        dx = _qconv_stacked_grouped_dx_xla(dy, w, scheme)
        (dw,) = jax.linear_transpose(
            lambda w_: _qconv_stacked_grouped_xla(x_st, w_, scheme),
            jax.ShapeDtypeStruct(w.shape, w.dtype),
        )(dy)
        return dx, dw

    conv.defvjp(fwd, bwd)
    return conv


_FAST8_GROUPED_SAME = _make_stacked_grouped(SCHEME8)


def qconv_fast8_grouped(x_st, w, *, padding="SAME"):
    """Rank-8 quaternion conv as ONE feature-grouped XLA conv dispatch
    (stacked F-major layout). Same math as qconv_fast8_stacked; measured
    faster at C>=256 via single-dispatch amortization. Odd-kernel SAME
    routes through the rotated-role custom VJP; anything else falls back to
    autodiff of the plain grouped formulation."""
    if _use_custom_vjp(w, padding):
        return _FAST8_GROUPED_SAME(x_st, w)
    return _qconv_stacked_grouped_xla(x_st, w, SCHEME8, padding)
