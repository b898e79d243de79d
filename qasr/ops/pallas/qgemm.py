"""Fused Pallas quaternion GEMM — 10-product scheme (PROOF ARTIFACT).

STATUS (round 5): this round-1 kernel predates the rank-8 scheme and is a
proof artifact, superseded by `qasr/ops/pallas/qgemm8.py` (rank-8,
in-VMEM combo formation, shape-picked tiling) as the Pallas dense tier.
Neither is production routing — `dense_variant="auto"` stays on the XLA
block GEMM by measurement (docs/performance.md, dense-stack analysis).
Reachable only via the legacy `dense_variant="pallas"` / `use_pallas`
knobs; kept for the 10-product A/B and the im2col conv wrapper.

Native-delegation obligation R2 (SURVEY.md §2b): the reference's quaternion
dense/conv bottoms out in one real GEMM on a 4x-expanded block kernel
(16 block products, 4x weight HBM traffic; SURVEY.md §3.2). This kernel
instead:

* keeps weights as the 10-product combination tensor ``wc [10, K, N]``
  (2.5x the raw components vs 4x for the block expansion) — the 4x kernel is
  never materialized,
* forms the 10 input combinations on the VPU in VMEM,
* runs the Hamilton product as **10** MXU matmuls instead of 16 (the
  Karatsuba-style bilinear scheme in quaternion.py — a 1.6x FLOP cut),
* accumulates in f32 scratch, preferring a single full-K block (K padded to
  the 128-lane tile) so there are no accumulator revisits; K falls back to a
  grid only when weights would overflow VMEM.

Layout: activations/outputs travel as ``[4, M, K]`` component-leading so every
VMEM block is dense in its last two (tiled) dims; the packed<->stacked
transposes live in the XLA wrappers where they fuse with neighbors. The
stacked interface (`qgemm_stacked`) is the differentiable primitive; conv
goes through it directly so im2col patches are transposed exactly once.

Backward: dx reuses this kernel with conjugate-transposed weights (the
Hamilton adjoint); dw is an XLA 16-product einsum whose contraction dim M is
large — already MXU-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.quaternion import (
    HAMILTON_COMP,
    HAMILTON_SIGN,
    OUT_COMBO,
    W_COMBO,
    X_COMBO,
)

# The 10 products' input combos: each a sum of 1 or 2 components (X_COMBO is
# 0/1), and each output component's signed product list (OUT_COMBO in -1/0/1).
_X_TERMS = [tuple(int(a) for a in np.nonzero(X_COMBO[p])[0]) for p in range(10)]
_OUT_TERMS = [
    [(p, int(OUT_COMBO[b, p])) for p in range(10) if OUT_COMBO[b, p] != 0]
    for b in range(4)
]

_LANE = 128
_VMEM_BUDGET = 6 * 1024 * 1024  # per concurrently-buffered working set


def _qgemm_kernel(x_ref, wc_ref, o_ref, acc_ref):
    # x_ref: [4, TM, TK]; wc_ref: [10, TK, TN]; o/acc_ref: [4, TM, TN]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prods = []
    for p in range(10):
        terms = _X_TERMS[p]
        lhs = x_ref[terms[0]]
        if len(terms) == 2:
            lhs = lhs + x_ref[terms[1]]
        prods.append(jnp.dot(lhs, wc_ref[p], preferred_element_type=jnp.float32))
    for b in range(4):
        acc = acc_ref[b]
        for p, sign in _OUT_TERMS[b]:
            acc = acc + prods[p] if sign > 0 else acc - prods[p]
        acc_ref[b] = acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def _qgemm_raw(x4, wc, *, tm, tn, tk):
    """x4: [4, M, K]; wc: [10, K, N] -> [4, M, N]; dims pre-padded to tiles."""
    _, m, k = x4.shape
    n = wc.shape[2]
    grid = (m // tm, n // tn, k // tk)
    return pl.pallas_call(
        _qgemm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, tm, tk), lambda i, j, kk: (0, i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (10, tk, tn), lambda i, j, kk: (0, kk, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, tm, tn), lambda i, j, kk: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, m, n), x4.dtype),
        scratch_shapes=[pltpu.VMEM((4, tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 10 * m * k * n,
            bytes_accessed=x4.size * x4.dtype.itemsize * (n // tn)
            + wc.size * wc.dtype.itemsize * (m // tm)
            + 4 * m * n * x4.dtype.itemsize,
            transcendentals=0,
        ),
    )(x4, wc)


def _pad_dim(x, axis, mult):
    rem = (-x.shape[axis]) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


def _round_up(x, m):
    return -(-x // m) * m


def _pick_tiles(m, k, n, itemsize):
    """Prefer one full-K block (no accumulator revisits); shrink TM/TN to fit
    the VMEM budget; K-grid only for very large K."""
    tn = min(_round_up(n, _LANE), 256)
    tm = min(_round_up(m, 8), 256)
    k_pad = _round_up(k, _LANE)

    def fits(tm, tn, tk):
        x_b = 4 * tm * tk * itemsize
        w_b = 10 * tk * tn * itemsize
        o_b = 4 * tm * tn * itemsize + 4 * tm * tn * 4
        return x_b + w_b + o_b <= _VMEM_BUDGET

    tk = k_pad
    while not fits(tm, tn, tk) and tm > 64:
        tm //= 2
    while not fits(tm, tn, tk) and tn > _LANE:
        tn //= 2
    while not fits(tm, tn, tk) and tk > _LANE:
        tk = _round_up(tk // 2, _LANE)
    return tm, tn, tk


def _qgemm_dw_kernel(x_ref, dy_ref, o_ref, acc_ref):
    # x_ref: [4, TM, TK]; dy_ref: [4, TM, TN]; o/acc_ref: [4, TK, TN].
    # dw[a] = sum_p W_COMBO[p, a] * (xc_p^T @ dyc_p) with the combos formed
    # on the VPU in VMEM — the 10-product adjoint of the forward kernel, so
    # the weight gradient also runs at 10/16 of the block-GEMM FLOPs.
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for p in range(10):
        xt = _X_TERMS[p]
        lhs = x_ref[xt[0]]
        if len(xt) == 2:
            lhs = lhs + x_ref[xt[1]]
        ot = _OUT_TERMS_OF_P[p]
        rhs = dy_ref[ot[0][0]] if ot[0][1] > 0 else -dy_ref[ot[0][0]]
        for b, sign in ot[1:]:
            rhs = rhs + dy_ref[b] if sign > 0 else rhs - dy_ref[b]
        prod = jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for a, sign in _W_TERMS_OF_P[p]:
            acc_ref[a] = acc_ref[a] + prod if sign > 0 else acc_ref[a] - prod

    @pl.when(m == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


# For product p: the (out-component b, sign) pairs whose cotangents combine
# into dyc_p (= OUT_COMBO column p), and the (weight-component a, sign) pairs
# dWc_p scatters into (= W_COMBO row p).
_OUT_TERMS_OF_P = [
    [(b, int(OUT_COMBO[b, p])) for b in range(4) if OUT_COMBO[b, p] != 0]
    for p in range(10)
]
_W_TERMS_OF_P = [
    [(a, int(W_COMBO[p, a])) for a in range(4) if W_COMBO[p, a] != 0]
    for p in range(10)
]


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def _qgemm_dw_raw(x4, dy4, *, tm, tn, tk):
    """x4: [4, M, K]; dy4: [4, M, N] -> dw [4, K, N] f32; dims pre-padded."""
    _, m, k = x4.shape
    n = dy4.shape[2]
    grid = (k // tk, n // tn, m // tm)
    return pl.pallas_call(
        _qgemm_dw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, tm, tk), lambda i, j, mm: (0, mm, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, tm, tn), lambda i, j, mm: (0, mm, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, tk, tn), lambda i, j, mm: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, k, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, tk, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 10 * m * k * n,
            bytes_accessed=x4.size * x4.dtype.itemsize * (n // tn)
            + dy4.size * dy4.dtype.itemsize * (k // tk)
            + 4 * k * n * 4,
            transcendentals=0,
        ),
    )(x4, dy4)


def _dw_pallas(x4, dy4):
    """10-product Pallas weight gradient; shapes as _dw_einsum."""
    _, m, k = x4.shape
    n = dy4.shape[2]
    tm = min(_round_up(m, 8), 512)
    tk = min(_round_up(k, _LANE), 256)
    tn = min(_round_up(n, _LANE), 256)
    x4p = _pad_dim(_pad_dim(x4, 1, tm), 2, tk)
    dy4p = _pad_dim(_pad_dim(dy4, 1, tm), 2, tn)
    out = _qgemm_dw_raw(x4p, dy4p, tm=tm, tn=tn, tk=tk)
    return out[:, :k, :n]


# T[a, b, c] = sign[a, b] * 1{comp[a, b] == c} — used by the dw einsum.
_DW_T = np.zeros((4, 4, 4), np.float32)
for _a in range(4):
    for _b in range(4):
        _DW_T[_a, _b, HAMILTON_COMP[_a, _b]] = HAMILTON_SIGN[_a, _b]


def _conj_transpose_w(w):
    """w [4, K, N] -> adjoint weights [4, N, K]: expand(conj_t(w)) == the
    blockwise transpose of expand(w), so dx = qgemm(dy, conj_t(w))."""
    wt = jnp.swapaxes(w, -1, -2)
    return jnp.concatenate([wt[:1], -wt[1:]], axis=0)


def _dw_einsum(x4, dy4):
    """dw[c] = sum_{a,b: comp[a,b]=c} sign[a,b] * x_a^T @ dy_b.

    x4: [4, M, K]; dy4: [4, M, N] -> [4, K, N]."""
    prods = jnp.einsum(
        "amk,bmn->abkn", x4, dy4, preferred_element_type=jnp.float32
    )
    return jnp.einsum("abkn,abc->ckn", prods, jnp.asarray(_DW_T, prods.dtype))


def _qgemm_stacked_impl(x4, w):
    """Core: x4 [4, M, K] x w [4, K, N] -> [4, M, N] via the Pallas kernel."""
    _, m, k = x4.shape
    n = w.shape[2]
    wc = jnp.einsum("akn,pa->pkn", w, jnp.asarray(W_COMBO, w.dtype)).astype(x4.dtype)
    tm, tn, tk = _pick_tiles(m, k, n, x4.dtype.itemsize)
    x4p = _pad_dim(_pad_dim(x4, 1, tm), 2, tk)
    wcp = _pad_dim(_pad_dim(wc, 1, tk), 2, tn)
    out = _qgemm_raw(x4p, wcp, tm=tm, tn=tn, tk=tk)
    return out[:, :m, :n]


@jax.custom_vjp
def qgemm_stacked(x4: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Quaternion GEMM on stacked layout: ``[4, M, K] x [4, K, N] -> [4, M, N]``."""
    return _qgemm_stacked_impl(x4, w)


def _qgemm_stacked_fwd(x4, w):
    return _qgemm_stacked_impl(x4, w), (x4, w)


def _qgemm_stacked_bwd(res, dy4):
    x4, w = res
    dx4 = _qgemm_stacked_impl(dy4, _conj_transpose_w(w).astype(w.dtype))
    # Pallas 10-product dw when the contraction (M) is large enough to feed
    # the MXU; the XLA 16-product einsum otherwise (tiny M = cheap anyway).
    if x4.shape[1] >= 256:
        dw = _dw_pallas(x4, dy4).astype(w.dtype)
    else:
        dw = _dw_einsum(x4, dy4).astype(w.dtype)
    return dx4, dw


qgemm_stacked.defvjp(_qgemm_stacked_fwd, _qgemm_stacked_bwd)


def _to_stacked(x):
    """packed [M, 4K] -> stacked [4, M, K]."""
    m, k4 = x.shape
    return jnp.moveaxis(x.reshape(m, 4, k4 // 4), 1, 0)


def _to_packed(x4):
    """stacked [4, M, N] -> packed [M, 4N]."""
    _, m, n = x4.shape
    return jnp.moveaxis(x4, 0, 1).reshape(m, 4 * n)


def qgemm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Packed quaternion GEMM: ``[M, 4K] x [4, K, N] -> [M, 4N]`` (Pallas)."""
    return _to_packed(qgemm_stacked(_to_stacked(x), w))


def qdense_pallas(x: jnp.ndarray, w: jnp.ndarray, **_) -> jnp.ndarray:
    """Quaternion dense on the Pallas qgemm; any leading batch dims."""
    lead = x.shape[:-1]
    out = qgemm(x.reshape(-1, x.shape[-1]), w)
    return out.reshape(*lead, out.shape[-1])


def qconv2d_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    strides=None,
    padding: str = "SAME",
    **_,
) -> jnp.ndarray:
    """Quaternion 2-D conv = slice-im2col + Pallas qgemm.

    Native-delegation obligation R1 (SURVEY.md §2b). Patches are built from
    kh*kw shifted slices (pure memory ops — no one-hot conv) in
    offset-major order, stacked straight into the kernel's ``[4, M, 9K]``
    layout with ONE transpose; weights reshape to offset-major ``[4, 9K, N]``
    with no data movement. The contraction dim 9*Cin reaches MXU tiles even
    for small channel counts, and the 4x-expanded kernel never exists.
    """
    if strides is None:
        strides = (1, 1)
    st, sf = strides
    b, h, wd, cin4 = x.shape
    cin = cin4 // 4
    _, kh, kw, _, cout = w.shape

    if padding == "SAME":
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        ph2, pw2 = kh - 1 - ph, kw - 1 - pw
        xp = jnp.pad(x, ((0, 0), (ph, ph2), (pw, pw2), (0, 0)))
    elif padding == "VALID":
        xp = x
    else:
        raise ValueError(f"unsupported padding {padding!r}")
    ho = (xp.shape[1] - kh) // st + 1
    wo = (xp.shape[2] - kw) // sf + 1

    # offset-major patches: [B, Ho, Wo, S=kh*kw, 4, cin]
    slices = [
        xp[:, dt : dt + (ho - 1) * st + 1 : st, df : df + (wo - 1) * sf + 1 : sf, :]
        for dt in range(kh)
        for df in range(kw)
    ]
    patches = jnp.stack(slices, axis=3).reshape(b, ho, wo, kh * kw, 4, cin)
    m = b * ho * wo
    # ONE transpose into the kernel layout [4, M, S*cin]
    p4 = jnp.transpose(patches.reshape(m, kh * kw, 4, cin), (2, 0, 1, 3))
    p4 = p4.reshape(4, m, kh * kw * cin)
    # weights [4, kh, kw, cin, cout] are already offset-major: pure reshape
    w2 = w.reshape(4, kh * kw * cin, cout)

    out = qgemm_stacked(p4, w2.astype(x.dtype))  # [4, M, cout]
    return _to_packed(out).reshape(b, ho, wo, 4 * cout)
