"""Scan-resident Pallas QLSTM recurrence (rank-8 scheme).

Round-4 measurement (docs/performance.md "QLSTM hybrid"): the in-scan
recurrent projection at M = 2B rows is WEIGHT-BANDWIDTH bound — the
``[2, 8, H, 4H]`` rank-8 recurrent weights (~8.4 MB bf16 at H=256) are
re-read from HBM on every one of the T scan steps, and halving the bytes
(rank-8 vs the expanded block GEMM) won 1.29x wall-clock. This kernel
removes that traffic STRUCTURALLY: the whole T-step bidirectional
recurrence runs inside ONE ``pallas_call`` whose grid walks time chunks,
with the recurrent weights DMA'd to VMEM once and resident for the entire
scan. Per step the kernel streams only the precomputed input projections in
(~xz) and the hidden/cell states out — a few hundred KB instead of 8.4 MB.

Structure (mirrors qasr/models/qlstm.py QBiLSTM's fused scan):

* state ``h, c`` live in VMEM scratch across grid steps (TPU grids execute
  sequentially on the core, so scratch IS the scan carry);
* the rank-8 Hamilton product: 2-sparse V8 input combos on the VPU, 8 dots
  per direction on the MXU against the resident U8-combined weights, dense
  O8 recombination on f32 accumulators;
* gate nonlinearities are computed on a GATE-MAJOR lane layout
  ``[gate(4), comp(4), H]`` so each gate is one contiguous lane slice — the
  wrapper transposes the packed component-major ``xz`` once in XLA (fuses
  into the producing GEMM's epilogue), never per step;
* ``lengths`` masking (state freeze past each utterance's last frame, per
  direction of the flipped backward stream) is a streamed 0/1 mask;
* backward is a second scan-resident kernel walking time in REVERSE,
  carrying ``(dh, dc)``, holding the transposed weights resident, reading
  the forward's saved post-nonlinearity gates (no matmul or transcendental
  recompute), and emitting per-step gate cotangents ``dz``. The weight
  gradient is then two large XLA einsums over the whole (T, B) extent —
  MXU-shaped batch GEMMs, not sequential work — and ``dxz = dz`` exactly.

Capability parity: the recurrent half of the reference family's QLSTM
(Parcollet et al., arXiv:1811.02566; SURVEY.md §7 stage 8 — reference mount
empty, see SURVEY.md §0). The reference runs its recurrence as per-step
framework ops (Keras/torch RNN loop); this is the TPU-native re-design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.quaternion import O8, U8, V8

# 2-sparse V8 rows as (component, coef) static tables
_V8_TERMS = tuple(
    tuple((int(a), float(V8[p, a])) for a in range(4) if V8[p, a] != 0.0)
    for p in range(8)
)
# dense O8 as static python floats
_O8 = tuple(tuple(float(O8[q, p]) for p in range(8)) for q in range(4))
# V8ᵀ columns (for the dx-side recombination): dh_a = Σ_p V8[p,a]·dhc_p
_V8_COLS = tuple(
    tuple((int(p), float(V8[p, a])) for p in range(8) if V8[p, a] != 0.0)
    for a in range(4)
)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _scaled(val, coef):
    if coef == 1.0:
        return val
    if coef == -1.0:
        return -val
    return val * val.dtype.type(coef)


def supported(hidden: int, dtype=None) -> bool:
    """Whether the scan-resident kernel handles this recurrence.

    H must be lane-aligned (gate/component slices are H-granular); bf16
    compute on the real TPU (None skips the check — interpret-mode tests
    run f32 deliberately). The resident weights are 2*8*H*4H*2 bytes; above
    H=512 (~33 MB) they no longer fit VMEM.
    """
    return (
        hidden % 128 == 0
        and hidden <= 512
        and (dtype is None or jnp.dtype(dtype) == jnp.bfloat16)
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    w_hbm,     # [D, 8, H, 4H] in ANY/HBM
    xz_ref,    # [TC, D, BT, 16H] VMEM block, GATE-major lanes [g, q, H]
    m_ref,     # [TC, D, BT, 128] VMEM block (1 = active, 0 = frozen)
    hs_ref,    # out [TC, D, BT, 4H] (component-major packed)
    cs_ref,    # out [TC, D, BT, 4H]
    g_ref,     # out [TC, D, BT, 16H] post-nonlinearity gates, gate-major
    wbuf,      # scratch [D, 8, H, 4H]
    h_s,       # scratch [D, BT, 4H] carried hidden (storage dtype)
    c_s,       # scratch [D, BT, 4H] carried cell
    wsem,
    *,
    tc: int,
    hid: int,
):
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    d, bt, fh = h_s.shape  # fh = 4H
    h4 = fh

    @pl.when((b_i == 0) & (t_i == 0))
    def _():
        cp = pltpu.make_async_copy(w_hbm, wbuf, wsem)
        cp.start()
        cp.wait()

    @pl.when(t_i == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    for tl in range(tc):
        h = h_s[:]  # [D, BT, 4H]
        c = c_s[:]
        # rank-8 products per direction: 2-sparse combos (VPU) + resident
        # dots (MXU). prods[d][p]: [BT, 4H] f32, lanes [gate, H].
        prods = []
        for di in range(d):
            hd = h[di]  # [BT, 4H]
            ha = [hd[:, a * hid : (a + 1) * hid] for a in range(4)]
            pd = []
            for p in range(8):
                terms = _V8_TERMS[p]
                cmb = _scaled(ha[terms[0][0]], terms[0][1])
                for a, coef in terms[1:]:
                    cmb = cmb + _scaled(ha[a], coef)
                pd.append(
                    jnp.dot(
                        cmb, wbuf[di, p], preferred_element_type=jnp.float32
                    )
                )
            prods.append(pd)

        # O8 recombination straight into GATE-major blocks: lane block
        # (g, q) of proj is Σ_p O8[q,p] · prods_p[:, g-th H slice]
        proj = []
        for di in range(d):
            blocks = []
            for g in range(4):
                for q in range(4):
                    acc = None
                    for p in range(8):
                        coef = _O8[q][p]
                        sl = prods[di][p][:, g * hid : (g + 1) * hid]
                        term = _scaled(sl, coef)
                        acc = term if acc is None else acc + term
                    blocks.append(acc)
            proj.append(jnp.concatenate(blocks, axis=-1))  # [BT, 16H]
        proj = jnp.stack(proj, axis=0)  # [D, BT, 16H] f32

        z = xz_ref[tl].astype(jnp.float32) + proj  # [D, BT, 16H]
        # gate-major: [i | f | o | g] each one contiguous [D, BT, 4H]
        sig = jax.nn.sigmoid(z[..., : 3 * h4])
        g_t = jnp.tanh(z[..., 3 * h4 :])
        i_t = sig[..., :h4]
        f_t = sig[..., h4 : 2 * h4]
        o_t = sig[..., 2 * h4 : 3 * h4]

        cf = c.astype(jnp.float32)
        c_cand = f_t * cf + i_t * g_t
        h_cand = o_t * jnp.tanh(c_cand)

        m = m_ref[tl][..., :1].astype(jnp.float32)  # [D, BT, 1]
        h_new = m * h_cand + (1.0 - m) * h.astype(jnp.float32)
        c_new = m * c_cand + (1.0 - m) * cf

        h_s[:] = h_new.astype(h_s.dtype)
        c_s[:] = c_new.astype(c_s.dtype)
        hs_ref[tl] = h_new.astype(hs_ref.dtype)
        cs_ref[tl] = c_new.astype(cs_ref.dtype)
        g_ref[tl] = jnp.concatenate([sig, g_t], axis=-1).astype(g_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tc", "bt"))
def _fwd_call(xz_gm, wc8, mask, *, tc: int, bt: int):
    t, d, b, c16 = xz_gm.shape
    hid = c16 // 16
    grid = (b // bt, t // tc)
    kernel = functools.partial(_fwd_kernel, tc=tc, hid=hid)
    flops = 2 * 8 * t * d * b * hid * 4 * hid + 40 * t * d * b * 4 * hid
    hs, cs, gates = pl.pallas_call(
        kernel,
        grid=grid,
        # explicit interpret off-TPU: the custom_partitioning per-shard
        # lowering runs outside any force_tpu_interpret_mode() context
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(
                (tc, d, bt, c16),
                lambda bi, ti: (ti, 0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tc, d, bt, 128),
                lambda bi, ti: (ti, 0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tc, d, bt, 4 * hid),
                lambda bi, ti: (ti, 0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tc, d, bt, 4 * hid),
                lambda bi, ti: (ti, 0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tc, d, bt, c16),
                lambda bi, ti: (ti, 0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, d, b, 4 * hid), xz_gm.dtype),
            jax.ShapeDtypeStruct((t, d, b, 4 * hid), xz_gm.dtype),
            jax.ShapeDtypeStruct((t, d, b, c16), xz_gm.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(wc8.shape, wc8.dtype),
            pltpu.VMEM((d, bt, 4 * hid), xz_gm.dtype),
            pltpu.VMEM((d, bt, 4 * hid), xz_gm.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xz_gm.size * xz_gm.dtype.itemsize * 3
            + wc8.size * wc8.dtype.itemsize,
            transcendentals=5 * t * d * b * 4 * hid,
        ),
    )(wc8, xz_gm, mask)
    return hs, cs, gates


# ---------------------------------------------------------------------------
# backward kernel: reverse-time scan carrying (dh, dc); emits dz
# ---------------------------------------------------------------------------


def _bwd_kernel(
    wt_hbm,    # [D, 8, 4H, H] transposed resident weights
    g_ref,     # [TC, D, BT, 16H] saved gates (gate-major, post-nonlinearity)
    cp_ref,    # [TC, D, BT, 4H] c_{t-1}
    dh_ref,    # [TC, D, BT, 4H] upstream dhs
    m_ref,     # [TC, D, BT, 128]
    dz_ref,    # out [TC, D, BT, 16H] gate-major
    wtbuf,     # scratch [D, 8, 4H, H]
    dh_s,      # scratch [D, BT, 4H] f32
    dc_s,      # scratch [D, BT, 4H] f32
    wsem,
    *,
    tc: int,
    hid: int,
):
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    d, bt, h4 = dh_s.shape

    @pl.when((b_i == 0) & (t_i == 0))
    def _():
        cp = pltpu.make_async_copy(wt_hbm, wtbuf, wsem)
        cp.start()
        cp.wait()

    @pl.when(t_i == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    for tl in range(tc - 1, -1, -1):
        gts = g_ref[tl].astype(jnp.float32)  # [D, BT, 16H]
        i_t = gts[..., :h4]
        f_t = gts[..., h4 : 2 * h4]
        o_t = gts[..., 2 * h4 : 3 * h4]
        g_t = gts[..., 3 * h4 :]
        c_prev = cp_ref[tl].astype(jnp.float32)
        c_cand = f_t * c_prev + i_t * g_t
        th = jnp.tanh(c_cand)

        m = m_ref[tl][..., :1].astype(jnp.float32)
        dh_tot = dh_ref[tl].astype(jnp.float32) + dh_s[:]
        dc_t = dc_s[:]
        dh_cand = m * dh_tot
        dc_cand = m * dc_t + dh_cand * o_t * (1.0 - th * th)
        do = dh_cand * th
        df = dc_cand * c_prev
        di = dc_cand * g_t
        dg = dc_cand * i_t
        dc_prev = (1.0 - m) * dc_t + dc_cand * f_t

        dzi = di * i_t * (1.0 - i_t)
        dzf = df * f_t * (1.0 - f_t)
        dzo = do * o_t * (1.0 - o_t)
        dzg = dg * (1.0 - g_t * g_t)
        dz = jnp.concatenate([dzi, dzf, dzo, dzg], axis=-1)  # [D, BT, 16H]
        dz_ref[tl] = dz.astype(dz_ref.dtype)

        # recurrent backward: dprods_p = Σ_q O8[q,p]·dz[(g,q) block], then
        # dhc_p = dprods_p @ wᵀ, then dh_a = Σ_p V8[p,a]·dhc_p
        dh_rec = []
        for di_ in range(d):
            dzd = dz[di_]  # [BT, 16H]
            qs = [
                [
                    dzd[:, (g * 4 + q) * hid : (g * 4 + q + 1) * hid]
                    for q in range(4)
                ]
                for g in range(4)
            ]
            dhc = []
            for p in range(8):
                blocks = []
                for g in range(4):
                    acc = None
                    for q in range(4):
                        term = _scaled(qs[g][q], _O8[q][p])
                        acc = term if acc is None else acc + term
                    blocks.append(acc)
                dprod = jnp.concatenate(blocks, axis=-1)  # [BT, 4H]
                dhc.append(
                    jnp.dot(
                        dprod.astype(wtbuf.dtype),
                        wtbuf[di_, p],
                        preferred_element_type=jnp.float32,
                    )
                )  # [BT, H]
            comps = []
            for a in range(4):
                acc = None
                for p, coef in _V8_COLS[a]:
                    term = _scaled(dhc[p], coef)
                    acc = term if acc is None else acc + term
                comps.append(acc)
            dh_rec.append(jnp.concatenate(comps, axis=-1))  # [BT, 4H]
        dh_rec = jnp.stack(dh_rec, axis=0)

        dh_s[:] = (1.0 - m) * dh_tot + dh_rec
        dc_s[:] = dc_prev


@functools.partial(jax.jit, static_argnames=("tc", "bt"))
def _bwd_call(wc8_t, gates, c_prev, dhs, mask, *, tc: int, bt: int):
    t, d, b, c16 = gates.shape
    hid = c16 // 16
    nt = t // tc
    grid = (b // bt, nt)
    kernel = functools.partial(_bwd_kernel, tc=tc, hid=hid)

    def rev(bi, ti):
        return (nt - 1 - ti, 0, bi, 0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((tc, d, bt, c16), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d, bt, 4 * hid), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d, bt, 4 * hid), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d, bt, 128), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tc, d, bt, c16), rev, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, d, b, c16), gates.dtype),
        scratch_shapes=[
            pltpu.VMEM(wc8_t.shape, wc8_t.dtype),
            pltpu.VMEM((d, bt, 4 * hid), jnp.float32),
            pltpu.VMEM((d, bt, 4 * hid), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * t * d * b * hid * 4 * hid + 60 * t * d * b * 4 * hid,
            bytes_accessed=gates.size * gates.dtype.itemsize * 2
            + wc8_t.size * wc8_t.dtype.itemsize,
            transcendentals=t * d * b * 4 * hid,
        ),
    )(wc8_t, gates, c_prev, dhs, mask)


# ---------------------------------------------------------------------------
# GSPMD partitioning: the scan is embarrassingly parallel across the batch
# rows (each (d, b) row carries its own independent recurrence), so under a
# DP-sharded jit the kernel partitions on B with everything else —
# crucially the sequential T axis and the resident weights — replicated.
# Without this rule the SPMD partitioner rejects the custom call outright
# (side-effecting HLO cannot have a replicated sharding). The per-shard
# lowering re-picks tiles and re-pads for its LOCAL batch, so any shard
# size works.
# ---------------------------------------------------------------------------


# Tests flip this to force the Pallas kernels (interpret mode) on a
# non-TPU backend; production routing uses the kernel on TPU and the
# XLA-scan twin elsewhere (also the branch that validates the
# custom_partitioning wiring on the fake CPU mesh, where interpret-mode
# pallas cannot lower inside a partitioned computation — io-callback
# effects).
FORCE_KERNEL = False


def _use_kernel() -> bool:
    return FORCE_KERNEL or jax.default_backend() == "tpu"


def _fwd_xla(xz_gm, wc8, mask):
    """XLA lax.scan twin of the fwd kernel: identical math (f32 in-step,
    storage-dtype carry), layouts, and outputs (hs, cs, gates).

    NOTE: the scheme tables enter as STATIC scalar FMAs (the kernel's own
    style), never as jnp constant matrices — custom_partitioning requires
    the traced per-shard function to be const-free."""
    t, d, b, c16 = xz_gm.shape
    hid = c16 // 16
    h4 = 4 * hid
    dt = xz_gm.dtype
    wc = wc8.astype(dt)

    def step(carry, inp):
        h, c = carry
        xz_t, m_t = inp
        hf = h.astype(jnp.float32)  # [D, B, 4H]
        ha = [hf[..., a * hid : (a + 1) * hid] for a in range(4)]
        hc = jnp.stack(
            [
                sum(_scaled(ha[a], coef) for a, coef in _V8_TERMS[p])
                for p in range(8)
            ],
            axis=1,
        )  # [D, 8, B, H]
        prods = jnp.einsum(
            "dpbk,dpkn->dpbn", hc.astype(dt), wc,
            preferred_element_type=jnp.float32,
        )  # [D, 8, B, 4H], lanes [g, hid]
        blocks = []
        for g in range(4):
            for q in range(4):
                acc = None
                for p in range(8):
                    term = _scaled(
                        prods[:, p, :, g * hid : (g + 1) * hid], _O8[q][p]
                    )
                    acc = term if acc is None else acc + term
                blocks.append(acc)
        proj = jnp.concatenate(blocks, axis=-1)  # [D, B, 16H] gate-major
        z = xz_t.astype(jnp.float32) + proj
        sig = jax.nn.sigmoid(z[..., : 3 * h4])
        g_t = jnp.tanh(z[..., 3 * h4 :])
        i_t = sig[..., :h4]
        f_t = sig[..., h4 : 2 * h4]
        o_t = sig[..., 2 * h4 : 3 * h4]
        cf = c.astype(jnp.float32)
        c_cand = f_t * cf + i_t * g_t
        h_cand = o_t * jnp.tanh(c_cand)
        m = m_t[..., :1].astype(jnp.float32)
        h_new = m * h_cand + (1.0 - m) * h.astype(jnp.float32)
        c_new = m * c_cand + (1.0 - m) * cf
        gates = jnp.concatenate([sig, g_t], axis=-1)
        hb, cb = h_new.astype(dt), c_new.astype(dt)
        return (hb, cb), (hb, cb, gates.astype(dt))

    init = (
        jnp.zeros((d, b, h4), dt),
        jnp.zeros((d, b, h4), dt),
    )
    (_, _), (hs, cs, gates) = lax.scan(step, init, (xz_gm, mask))
    return hs, cs, gates


def _bwd_xla(wc8_t, gates, c_prev, dhs, mask):
    """XLA reverse-scan twin of the bwd kernel: emits dz (const-free, see
    _fwd_xla note)."""
    t, d, b, c16 = gates.shape
    hid = c16 // 16
    h4 = 4 * hid
    dt = gates.dtype
    wt = wc8_t.astype(dt)  # [D, 8, 4H, H]

    def step(carry, inp):
        dh_s, dc_s = carry
        g_all, cp, dh_up, m_t = inp
        gf = g_all.astype(jnp.float32)
        i_t = gf[..., :h4]
        f_t = gf[..., h4 : 2 * h4]
        o_t = gf[..., 2 * h4 : 3 * h4]
        g_t = gf[..., 3 * h4 :]
        cpf = cp.astype(jnp.float32)
        c_cand = f_t * cpf + i_t * g_t
        th = jnp.tanh(c_cand)
        m = m_t[..., :1].astype(jnp.float32)
        dh_tot = dh_up.astype(jnp.float32) + dh_s
        dh_cand = m * dh_tot
        dc_cand = m * dc_s + dh_cand * o_t * (1.0 - th * th)
        do = dh_cand * th
        df = dc_cand * cpf
        di = dc_cand * g_t
        dg = dc_cand * i_t
        dc_prev = (1.0 - m) * dc_s + dc_cand * f_t
        dz = jnp.concatenate(
            [
                di * i_t * (1.0 - i_t),
                df * f_t * (1.0 - f_t),
                do * o_t * (1.0 - o_t),
                dg * (1.0 - g_t * g_t),
            ],
            axis=-1,
        )  # [D, B, 16H] gate-major
        # dprods_p = Σ_q O8[q,p]·dz[(g,q) block], lanes [g, hid]
        qs = [
            [
                dz[..., (g * 4 + q) * hid : (g * 4 + q + 1) * hid]
                for q in range(4)
            ]
            for g in range(4)
        ]
        dprods = jnp.stack(
            [
                jnp.concatenate(
                    [
                        sum(_scaled(qs[g][q], _O8[q][p]) for q in range(4))
                        for g in range(4)
                    ],
                    axis=-1,
                )
                for p in range(8)
            ],
            axis=1,
        )  # [D, 8, B, 4H]
        dhc = jnp.einsum(
            "dpbn,dpnk->dpbk", dprods.astype(dt), wt,
            preferred_element_type=jnp.float32,
        )  # [D, 8, B, H]
        dh_rec = jnp.concatenate(
            [
                sum(_scaled(dhc[:, p], coef) for p, coef in _V8_COLS[a])
                for a in range(4)
            ],
            axis=-1,
        )  # [D, B, 4H]
        dh_prev = (1.0 - m) * dh_tot + dh_rec
        return (dh_prev, dc_prev), dz.astype(dt)

    init = (
        jnp.zeros((d, b, h4), jnp.float32),
        jnp.zeros((d, b, h4), jnp.float32),
    )
    (_, _), dz = lax.scan(
        step, init, (gates, c_prev, dhs, mask), reverse=True
    )
    return dz


def _fwd_local(xz_gm, wc8, mask):
    """Per-shard forward: the scan-resident kernel on TPU, the XLA twin
    elsewhere. Pads (T, B) to local tile multiples for the kernel; the
    per-shard lowering under custom_partitioning lands here with LOCAL
    shapes."""
    if not _use_kernel():
        return _fwd_xla(xz_gm, wc8, mask)
    t, d, b, c16 = xz_gm.shape
    hid = c16 // 16
    tc, bt = _pick_tiles(t, d, b, hid)
    t_pad = _round_up(t, tc)
    b_pad = _round_up(b, bt)
    if (t_pad, b_pad) != (t, b):
        pad = ((0, t_pad - t), (0, 0), (0, b_pad - b), (0, 0))
        xz_gm = jnp.pad(xz_gm, pad)
        mask = jnp.pad(mask, pad)  # zero mask = frozen state on pad steps
    hs, cs, gates = _fwd_call(xz_gm, wc8, mask, tc=tc, bt=bt)
    return hs[:t, :, :b], cs[:t, :, :b], gates[:t, :, :b]


def _bwd_local(wc8_t, gates, c_prev, dhs, mask):
    if not _use_kernel():
        return _bwd_xla(wc8_t, gates, c_prev, dhs, mask)
    t, d, b, c16 = gates.shape
    hid = c16 // 16
    tc, bt = _pick_tiles(t, d, b, hid)
    t_pad = _round_up(t, tc)
    b_pad = _round_up(b, bt)
    if (t_pad, b_pad) != (t, b):
        pad = ((0, t_pad - t), (0, 0), (0, b_pad - b), (0, 0))
        gates = jnp.pad(gates, pad)
        mask = jnp.pad(mask, pad)
        c_prev = jnp.pad(c_prev, pad)
        dhs = jnp.pad(dhs, pad)
    dz = _bwd_call(wc8_t, gates, c_prev, dhs, mask, tc=tc, bt=bt)
    return dz[:t, :, :b]


def _make_partitioned(local_fn, rule, stream_args):
    """``stream_args[i]`` True: operand i is a ``[T, D, B, X]`` stream whose
    batch dim may shard; False: a weight tensor that must replicate."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    fn = custom_partitioning(local_fn)

    def _b_spec(arg_shapes):
        # batch-dim spec from the first stream operand's sharding
        for a, is_stream in zip(arg_shapes, stream_args):
            if is_stream and a.sharding is not None:
                spec = a.sharding.spec
                if len(spec) > 2 and spec[2] is not None:
                    return spec[2]
        return None

    def partition(mesh, arg_shapes, result_shape):
        b_axis = _b_spec(arg_shapes)
        row = PartitionSpec(None, None, b_axis, None)
        rep = PartitionSpec()
        arg_sh = tuple(
            NamedSharding(mesh, row if is_stream else rep)
            for a, is_stream in zip(arg_shapes, stream_args)
        )
        res = (result_shape,) if not isinstance(result_shape, (tuple, list)) else result_shape
        result_sh = tuple(NamedSharding(mesh, row) for _ in res)
        if len(result_sh) == 1:
            result_sh = result_sh[0]
        return mesh, local_fn, result_sh, arg_sh

    def infer(mesh, arg_shapes, result_shape):
        b_axis = _b_spec(arg_shapes)
        row = PartitionSpec(None, None, b_axis, None)
        res = (result_shape,) if not isinstance(result_shape, (tuple, list)) else result_shape
        out = tuple(NamedSharding(mesh, row) for _ in res)
        return out if len(out) > 1 else out[0]

    # Shardy rule: only the batch factor `b` is free to shard; the
    # sequential time factor, lanes, and the resident weights must
    # replicate (need_replication_factors)
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule[0],
        need_replication_factors=rule[1],
    )
    return fn


_fwd_part = _make_partitioned(
    _fwd_local,
    (
        "t d b c, e p k n, t d b m -> t d b h, t d b h, t d b c",
        ("t", "d", "c", "e", "p", "k", "n", "m", "h"),
    ),
    (True, False, True),
)
_bwd_part = _make_partitioned(
    _bwd_local,
    (
        "e p n k, t d b c, t d b h, t d b h, t d b m -> t d b c",
        # need_replication factors MUST be listed in first-appearance order
        ("e", "p", "n", "k", "t", "d", "c", "h", "m"),
    ),
    (False, True, True, True, True),
)


# ---------------------------------------------------------------------------
# custom-VJP core + public wrapper
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _scan_core(xz_gm, wc8, mask):
    hs, _, _ = _fwd_part(xz_gm, wc8, mask)
    return hs


def _scan_core_fwd(xz_gm, wc8, mask):
    hs, cs, gates = _fwd_part(xz_gm, wc8, mask)
    return hs, (wc8, mask, hs, cs, gates)


def _scan_core_bwd(res, dhs):
    wc8, mask, hs, cs, gates = res
    t, d, b, h4 = hs.shape
    hid = h4 // 4
    wc8_t = jnp.swapaxes(wc8, 2, 3)  # [D, 8, 4H, H] — once per train step
    c_prev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    dz = _bwd_part(wc8_t, gates, c_prev, dhs.astype(gates.dtype), mask)
    # dW: two large XLA einsums over the full (T, B) extent (contraction
    # rows T*B — MXU-shaped), NOT sequential work. dz is already masked.
    h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    hq = h_prev.reshape(t, d, b, 4, hid)
    hcp = jnp.einsum(
        "tdbak,pa->tdbpk", hq, jnp.asarray(V8, h_prev.dtype)
    )  # [T, D, B, 8, H]
    dzr = dz.reshape(t, d, b, 4, 4, hid)  # [g, q, H]
    dprods = jnp.einsum(
        "tdbgqh,qp->tdbpgh", dzr, jnp.asarray(O8, dz.dtype)
    )  # [T, D, B, 8, 4, H]
    dwc8 = jnp.einsum(
        "tdbpk,tdbpgh->dpkgh",
        hcp,
        dprods,
        preferred_element_type=jnp.float32,
    ).reshape(d, 8, hid, 4 * hid)
    return dz, dwc8.astype(wc8.dtype), jnp.zeros_like(mask)


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def _pick_tiles(t: int, d: int, b: int, hid: int) -> tuple[int, int]:
    """(tc, bt) keeping the streamed VMEM blocks ~1 MB at bf16 so the
    resident weights + double-buffered streams stay under the 16 MB VMEM
    budget (docs/performance.md has the accounting)."""
    bt = min(b, 8)
    row_bytes = d * bt * 16 * hid * 2  # one t-step of xz at bf16
    tc = max(1, min(8, (512 * 1024) // max(row_bytes, 1)))
    return tc, bt


def qlstm_scan_fast8(
    xz: jnp.ndarray,
    wc8: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scan-resident rank-8 QLSTM recurrence.

    Args:
      xz: ``[T, D, B, 16H]`` precomputed input projections (+bias) in the
        scan layout of qasr.models.qlstm.QBiLSTM: packed component-major
        quaternion lanes ``[comp(4), gate(4), H]``, direction 1 (if D=2)
        already time-flipped.
      wc8: ``[D, 8, H, 4H]`` U8-combined recurrent weights (per direction).
      lengths: optional ``[B]`` frame counts; state freezes past each
        utterance's last frame (direction 1 on the flipped stream freezes
        its FIRST ``T - len`` steps), matching QBiLSTM's masking exactly.

    Returns:
      hs: ``[T, D, B, 4H]`` hidden states (packed component-major), in scan
      order (direction 1 still flipped — the caller un-flips, as QBiLSTM
      does).
    """
    t, d, b, c16 = xz.shape
    hid = c16 // 16
    if wc8.shape != (d, 8, hid, 4 * hid):
        raise ValueError(f"wc8 shape {wc8.shape} != {(d, 8, hid, 4 * hid)}")
    if hid % 128:
        raise ValueError(f"hidden size {hid} must be lane-aligned (128)")

    # component-major -> gate-major lanes (fuses into the producing GEMM)
    xz_gm = (
        xz.reshape(t, d, b, 4, 4, hid)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(t, d, b, c16)
    )

    if lengths is None:
        act0 = jnp.ones((t, b), jnp.float32)
        act1 = act0
    else:
        t_iota = jnp.arange(t)[:, None]
        act0 = (t_iota < lengths[None, :]).astype(jnp.float32)
        act1 = ((t - 1 - t_iota) < lengths[None, :]).astype(jnp.float32)
    mask = jnp.stack([act0, act1][:d], axis=1)  # [T, D, B]
    mask = jnp.broadcast_to(mask[..., None], (t, d, b, 128)).astype(xz.dtype)

    # (T, B) padding to tile multiples happens inside _fwd_local/_bwd_local
    # so the per-shard lowering under a DP mesh re-pads its LOCAL batch
    return _scan_core(xz_gm, wc8, mask)
