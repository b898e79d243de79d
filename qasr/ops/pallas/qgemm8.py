"""Rank-8 quaternion GEMM with in-VMEM combo formation.

Round-4 measurement (docs/performance.md, dense-stack analysis): both XLA
rank-8 dense formulations (packed and stacked-entry) died on the same
cost — the 8 two-sparse input combos materialize in HBM (~218 MB at the
flagship's K) and the traffic eats the 8/16 MXU FLOP cut. This kernel is
the one formulation that eliminates that cost: the combos are formed in
VMEM from the streamed input tile (one VPU FMA each — V8 rows are
2-sparse), the 8 products accumulate in an f32 VMEM scratch across the K
grid, and the dense O8 recombination runs once per output tile in the
epilogue. Zero HBM combo traffic; 8/16 the block GEMM's MXU FLOPs.

Layout: component-leading ``x4 [4, M, K]`` / ``y4 [4, M, N]`` so component
access is a leading-dim index (never a sublane slice — a ``[M, 4, K]``
block would tile the size-4 dim as sublanes, padding 2-4x and paying a
relayout per slice). Wrappers convert from/to the packed ``[M, 4K]``
layout; under jit the entry/exit transposes fuse with neighbouring ops.

The backward reuses the kernel with the scheme's roles rotated (input
combos from O8's columns, output recombination from V8's columns, weights
transposed) — the same structure as the fused conv's dx
(qasr/ops/pallas/qconv_ft.py). dW runs as ONE full-width XLA dot_general
``[4, M, K] x [4, M, N] -> [4, K, 4, N]`` contracted with the Hamilton
block table — single dispatch, no combos, no transposes.

Reference capability: the quaternion dense layer (SURVEY.md §2a C2,
delegation obligation R2; mount empty — provenance SURVEY.md §0). The
reference executes dense as one real GEMM on the 4x-expanded block matrix
(16 block products); this runs the bilinear-rank floor of 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.quaternion import HAMILTON_E, O8, U8, V8

def _tiles(m: int, k: int, n: int) -> tuple[int, int, int]:
    """Shape-dependent tile pick (TPU v5e sweep, benchmarks r5): at K >=
    1024 the weight stream (8·K·N re-fetched once per M tile) dominates, so
    a taller TM halves the re-fetch count — (512, 256, 256) measured best
    at the flagship dense (K=3328) and qlstm-L1 (K=2048) shapes; below
    that (256, 256, K) wins (qlstm-mid K=512: 0.42 vs 0.56 ms). Larger
    tiles (TNxTM >= 512x384) blow the 16 MB VMEM budget at acc f32."""
    if k >= 1024:
        tm, tn, tk = 512, 256, 256
    else:
        tm, tn, tk = 256, 256, 512
    return min(tm, m), min(tn, n), min(tk, k)

# forward: input combos = V8 rows (2-sparse), output = O8 rows (dense)
_FWD_IN = tuple(
    tuple((int(a), float(V8[p, a])) for a in range(4) if V8[p, a] != 0.0)
    for p in range(8)
)
_FWD_OUT = tuple(tuple(float(O8[q, p]) for p in range(8)) for q in range(4))
# dx: roles rotated — input combos from O8 columns, outputs from V8 columns
_DX_IN = tuple(
    tuple((int(b), float(O8[b, p])) for b in range(4) if O8[b, p] != 0.0)
    for p in range(8)
)
_DX_OUT = tuple(tuple(float(V8[p, a]) for p in range(8)) for a in range(4))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _scaled(val, coef):
    if coef == 1.0:
        return val
    if coef == -1.0:
        return -val
    return val * val.dtype.type(coef)


def _qgemm8_kernel(
    x_ref,    # [4, TM, TK]
    w_ref,    # [8, TK, TN]
    y_ref,    # [4, TM, TN]
    acc,      # scratch [8, TM, TN] f32
    *,
    in_terms,
    out_coefs,
    nk: int,
):
    k_i = pl.program_id(2)
    comps = [x_ref[a] for a in range(4)]
    for p in range(8):
        terms = in_terms[p]
        cmb = _scaled(comps[terms[0][0]], terms[0][1])
        for a, coef in terms[1:]:
            cmb = cmb + _scaled(comps[a], coef)
        prod = jnp.dot(cmb, w_ref[p], preferred_element_type=jnp.float32)
        if nk == 1:
            acc[p] = prod
        else:
            @pl.when(k_i == 0)
            def _(p=p, prod=prod):
                acc[p] = prod

            @pl.when(k_i > 0)
            def _(p=p, prod=prod):
                acc[p] = acc[p] + prod

    @pl.when(k_i == nk - 1)
    def _():
        for b in range(4):
            out = None
            for p in range(8):
                coef = out_coefs[b][p]
                if coef == 0.0:
                    continue
                term = _scaled(acc[p], coef)
                out = term if out is None else out + term
            y_ref[b] = out.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("in_kind",))
def _qgemm8_raw(x4, wc8, in_kind="fwd"):
    """x4: [4, M, K] (M % TM == 0, K % TK' == 0 handled by caller padding);
    wc8: [8, K, N] -> y4 [4, M, N]."""
    _, m, k = x4.shape
    _, _, n = wc8.shape
    tm, tn, tk = _tiles(m, k, n)
    grid = (m // tm, n // tn, k // tk)
    in_terms = _FWD_IN if in_kind == "fwd" else _DX_IN
    out_coefs = _FWD_OUT if in_kind == "fwd" else _DX_OUT
    kernel = functools.partial(
        _qgemm8_kernel,
        in_terms=in_terms,
        out_coefs=out_coefs,
        nk=grid[2],
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, tm, tk),
                lambda mi, ni, ki: (0, mi, ki),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, tk, tn),
                lambda mi, ni, ki: (0, ki, ni),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, tm, tn),
            lambda mi, ni, ki: (0, mi, ni),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((4, m, n), x4.dtype),
        scratch_shapes=[pltpu.VMEM((8, tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * m * k * n,
            bytes_accessed=(4 * m * k + 8 * k * n * (m // tm) + 4 * m * n)
            * x4.dtype.itemsize,
            transcendentals=0,
        ),
    )(x4, wc8)


def supported(k: int, n: int, dtype=None) -> bool:
    """K and N must be lane-aligned; bf16 on the real TPU (None skips —
    interpret-mode tests run f32)."""
    return (
        k % 128 == 0
        and n % 128 == 0
        and (dtype is None or jnp.dtype(dtype) == jnp.bfloat16)
    )


def _padded_call(x4, wc8, kind):
    """Pad (M, K-contraction, N-out) to tile multiples, run, slice back."""
    _, m, k = x4.shape
    _, _, n = wc8.shape
    tm, tn, tk = _tiles(
        _round_up(m, 8), _round_up(k, 128), _round_up(n, 128)
    )
    mp = _round_up(m, tm)
    kp = _round_up(k, tk)
    np_ = _round_up(n, tn)
    if (mp, kp) != (m, k):
        x4 = jnp.pad(x4, ((0, 0), (0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        wc8 = jnp.pad(wc8, ((0, 0), (0, kp - k), (0, np_ - n)))
    y = _qgemm8_raw(x4, wc8, kind)
    return y[:, :m, :n]


@jax.custom_vjp
def qgemm8_cl(x4: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Component-leading rank-8 quaternion GEMM.

    x4: ``[4, M, K]`` quaternion input, component-leading;
    w: ``[4, K, N]`` stacked quaternion weights (checkpoint layout).
    Returns ``[4, M, N]``.
    """
    return _qgemm8_fwd_impl(x4, w)


def _qgemm8_fwd_impl(x4, w):
    wc8 = jnp.einsum(
        "akn,pa->pkn", w, jnp.asarray(U8, w.dtype)
    ).astype(x4.dtype)  # [8, K, N]
    return _padded_call(x4, wc8, "fwd")


def _qgemm8_vjp_fwd(x4, w):
    return _qgemm8_fwd_impl(x4, w), (x4, w)


def _qgemm8_vjp_bwd(res, dy4):
    x4, w = res
    wc8 = jnp.einsum("akn,pa->pkn", w, jnp.asarray(U8, w.dtype)).astype(
        dy4.dtype
    )
    wc8_t = jnp.swapaxes(wc8, 1, 2)  # [8, N, K]
    dx4 = _padded_call(dy4, wc8_t, "dx")
    # dW in XLA. Two formulations, picked by arithmetic: the rank-8 form
    # (8 GEMMs + combo materialization — the combos cost HBM once, in the
    # bwd only) wins when the GEMM work dominates the combo traffic; the
    # single full-width block dot_general (16 products, zero combos) wins
    # at small K*N where traffic dominates.
    m = x4.shape[1]
    k, n = w.shape[1], w.shape[2]
    if k * n >= 1024 * 1024:
        xc = jnp.einsum("amk,pa->pmk", x4, jnp.asarray(V8, x4.dtype))
        dyc = jnp.einsum("bmn,pb->pmn", dy4, jnp.asarray(O8.T, dy4.dtype))
        dwc8 = lax.dot_general(
            xc,
            dyc,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [8, K, N]
        dw = jnp.einsum("pkn,pa->akn", dwc8, jnp.asarray(U8, dwc8.dtype))
    else:
        dw_big = lax.dot_general(
            x4,
            dy4,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4, K, 4, N]
        dw = jnp.einsum(
            "akbn,cab->ckn", dw_big, jnp.asarray(HAMILTON_E, dw_big.dtype)
        )
    return dx4, dw.astype(w.dtype)


qgemm8_cl.defvjp(_qgemm8_vjp_fwd, _qgemm8_vjp_bwd)


def qdense_pallas8(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Packed-layout wrapper: ``[..., 4K] x [4, K, N] -> [..., 4N]``.

    Entry/exit transposes to/from the component-leading kernel layout; under
    jit they fuse with neighbouring ops (and vanish entirely when chained
    through ``qgemm8_cl`` directly).
    """
    *lead, c4 = x.shape
    k = c4 // 4
    if w.shape != (4, k, w.shape[2]):
        raise ValueError(f"weights {w.shape} incompatible with x {x.shape}")
    m = int(np.prod(lead)) if lead else 1
    x4 = jnp.moveaxis(x.reshape(m, 4, k), 1, 0)  # [4, M, K]
    y4 = qgemm8_cl(x4, w)
    y = jnp.moveaxis(y4, 0, 1).reshape(*lead, 4 * w.shape[2])
    return y
