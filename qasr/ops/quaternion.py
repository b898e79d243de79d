"""Core quaternion algebra for Hamilton-product layers.

Reference capability: the reference implements quaternion convolution/dense by
concatenating the four real weight sub-tensors (r, i, j, k) into one 4x4
block-structured real kernel and calling the backend's real conv2d/dot once
(reference: quaternion conv layer `call()` assembling ``cat_kernels_4_quaternion``;
mount was empty at build time — see SURVEY.md §0/§3.2, provenance [BASELINE][FAMILY]).

This module is the TPU-native redesign of that algebra:

* Packed layout: a quaternion tensor with C quaternion channels is stored as a
  real tensor with trailing dim ``4*C`` in *component-major* order
  ``[r_0..r_{C-1}, i_0..i_{C-1}, j_0..j_{C-1}, k_0..k_{C-1}]`` — i.e. it
  reshapes to ``[..., 4, C]``. This matches the reference's concat layout so
  the 4x-expanded real-conv oracle is a trivial reshape away.
* Weights are kept as a single stacked array ``W[4, ..., Cin, Cout]`` (never
  pre-expanded in checkpoints); the 4x4 block-structured real matrix is only
  materialized transiently inside jit, where XLA fuses it, or not at all in
  the Pallas kernels (qasr/ops/pallas/).

Hamilton product convention (y = w ⊗ x, weight acting on the left):

    y_r = Wr·xr − Wi·xi − Wj·xj − Wk·xk
    y_i = Wr·xi + Wi·xr + Wj·xk − Wk·xj
    y_j = Wr·xj + Wj·xr + Wk·xi − Wi·xk
    y_k = Wr·xk + Wk·xr + Wi·xj − Wj·xi
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

R, I, J, K = 0, 1, 2, 3

# Block-structure tables for the 4x4 real matrix acting on a *row vector* of
# packed input components: y_b = sum_a sign[a][b] * x_a @ W[comp[a][b]].
# Rows = input component a, cols = output component b.
HAMILTON_COMP = np.array(
    [
        [R, I, J, K],
        [I, R, K, J],
        [J, K, R, I],
        [K, J, I, R],
    ],
    dtype=np.int32,
)
HAMILTON_SIGN = np.array(
    [
        [1, 1, 1, 1],
        [-1, 1, 1, -1],
        [-1, -1, 1, 1],
        [-1, 1, -1, 1],
    ],
    dtype=np.int32,
)

# E[c, a, b] = sign[a, b] * 1{comp[a, b] == c}: W_big's (a,b) block is
# sum_c E[c,a,b] * w[c], which lets the whole 4x4 block expansion run as one
# tiny tensor contraction already laid out in block order (no transpose).
HAMILTON_E = np.zeros((4, 4, 4), np.float32)
for _a in range(4):
    for _b in range(4):
        HAMILTON_E[int(HAMILTON_COMP[_a, _b]), _a, _b] = float(
            HAMILTON_SIGN[_a, _b]
        )


def split_components(x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Split packed ``[..., 4C]`` into four ``[..., C]`` components (r,i,j,k)."""
    c4 = x.shape[-1]
    if c4 % 4:
        raise ValueError(f"packed quaternion dim must be divisible by 4, got {c4}")
    c = c4 // 4
    return tuple(x[..., n * c : (n + 1) * c] for n in range(4))


def pack_components(r, i, j, k) -> jnp.ndarray:
    """Concatenate four ``[..., C]`` components into packed ``[..., 4C]``."""
    return jnp.concatenate([r, i, j, k], axis=-1)


def hamilton_expand(w: jnp.ndarray, conjugate: bool = False) -> jnp.ndarray:
    """Expand stacked quaternion weights into the 4x4 block real matrix.

    Args:
      w: ``[4, *spatial, Cin, Cout]`` stacked component weights.
      conjugate: expand conj(w) instead (negates i,j,k blocks) — used by
        transposed/adjoint ops.

    Returns:
      ``[*spatial, 4*Cin, 4*Cout]`` block-structured real weights, the exact
      matrix the reference materializes every step (SURVEY.md §3.2). Here it is
      only built transiently inside jit for the XLA fallback path.
    """
    if conjugate:
        w = jnp.concatenate([w[:1], -w[1:]], axis=0)
    out_shape = (*w.shape[1:-2], 4 * w.shape[-2], 4 * w.shape[-1])
    if w.dtype == jnp.bfloat16:
        # Contraction form: the einsum output is already in block order
        # ([*sp, a, K, b, N]) so no transpose is needed, and its backward is a
        # clean contraction too (no scatter). The MXU rounds the 0/±1
        # selection to bf16 — free here since w is already bf16. Measured
        # fastest per train step on v5e (vs 16-concat and gather+transpose).
        wb = jnp.einsum(
            "cab,c...kn->...akbn", jnp.asarray(HAMILTON_E, w.dtype), w
        )
        return wb.reshape(out_shape)
    # f32/f64: exact selection via gather + signed scale + transpose.
    n_sp = w.ndim - 3
    wb = jnp.take(w, jnp.asarray(HAMILTON_COMP.reshape(-1)), axis=0)
    wb = wb.reshape(4, 4, *w.shape[1:])
    sign = jnp.asarray(HAMILTON_SIGN, w.dtype).reshape(4, 4, *([1] * (w.ndim - 1)))
    wb = wb * sign
    # [a, b, *sp, K, N] -> [*sp, a, K, b, N] -> [*sp, 4K, 4N]
    perm = tuple(range(2, 2 + n_sp)) + (0, 2 + n_sp, 1, 3 + n_sp)
    wb = jnp.transpose(wb, perm)
    return wb.reshape(out_shape)


# ---------------------------------------------------------------------------
# 10-multiplication Hamilton product (Karatsuba-style bilinear scheme).
#
# The reference computes the Hamilton product as 16 block products (one
# 4x-expanded real conv/GEMM, SURVEY.md §3.2). The product bilinear form
# admits a 10-real-multiplication scheme built from pairwise component sums:
#
#   m1..m4 = Wr·xr, Wi·xi, Wj·xj, Wk·xk
#   m5 = (Wr+Wi)(xr+xi)   m6 = (Wj−Wk)(xj+xk)
#   m7 = (Wr+Wj)(xr+xj)   m8 = (Wk−Wi)(xk+xi)
#   m9 = (Wr+Wk)(xr+xk)   m10 = (Wi−Wj)(xi+xj)
#
#   y_r = m1 − m2 − m3 − m4
#   y_i = (m5 − m1 − m2) + (m6 − m3 + m4)
#   y_j = (m7 − m1 − m3) + (m8 − m4 + m2)
#   y_k = (m9 − m1 − m4) + (m10 − m2 + m3)
#
# For conv/GEMM each "multiplication" is a real matmul on the MXU, so this is
# a 16→10 FLOP reduction (1.6x) at the cost of cheap elementwise combos.
# Verified against the naive product in tests/test_quaternion_ops.py.
# ---------------------------------------------------------------------------

# rows: the 10 products; columns: (r, i, j, k) coefficients
X_COMBO = np.array(
    [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
        [1, 1, 0, 0], [0, 0, 1, 1], [1, 0, 1, 0], [0, 1, 0, 1],
        [1, 0, 0, 1], [0, 1, 1, 0],
    ],
    dtype=np.float32,
)
W_COMBO = np.array(
    [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
        [1, 1, 0, 0], [0, 0, 1, -1], [1, 0, 1, 0], [0, -1, 0, 1],
        [1, 0, 0, 1], [0, 1, -1, 0],
    ],
    dtype=np.float32,
)
# rows: output components (r, i, j, k); columns: the 10 products
OUT_COMBO = np.array(
    [
        [1, -1, -1, -1, 0, 0, 0, 0, 0, 0],
        [-1, -1, -1, 1, 1, 1, 0, 0, 0, 0],
        [-1, 1, -1, -1, 0, 0, 1, 1, 0, 0],
        [-1, -1, 1, -1, 0, 0, 0, 0, 1, 1],
    ],
    dtype=np.float32,
)


def hamilton_product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamilton product of packed quaternion tensors (q1 ⊗ q2)."""
    ar, ai, aj, ak = split_components(q1)
    br, bi, bj, bk = split_components(q2)
    return pack_components(
        ar * br - ai * bi - aj * bj - ak * bk,
        ar * bi + ai * br + aj * bk - ak * bj,
        ar * bj + aj * br + ak * bi - ai * bk,
        ar * bk + ak * br + ai * bj - aj * bi,
    )


def qdense_naive(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Oracle: quaternion dense as 16 explicit component GEMMs.

    x: ``[..., 4*Cin]`` packed; w: ``[4, Cin, Cout]``. Slow/reference path used
    only in tests (SURVEY.md §4 test 1).
    """
    xs = split_components(x)
    outs = []
    for b in range(4):
        acc = None
        for a in range(4):
            term = HAMILTON_SIGN[a, b] * (xs[a] @ w[HAMILTON_COMP[a, b]])
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
