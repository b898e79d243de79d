#!/usr/bin/env python
"""qasr headline benchmark — one JSON line for the driver.

Metric: training throughput in audio-seconds/s/chip on the flagship TIMIT
QCNN (BASELINE.json north-star metric). vs_baseline compares against the
*reference's computation strategy* — the equal-feature-map real CNN whose
conv FLOPs equal the 4x-expanded block conv the reference executes every step
(SURVEY.md §3.2, BASELINE.json config 3) — identical harness, same hardware.

NOTE (round 2): the flagship preset is now the paper's best TIMIT model —
uniform 256 feature maps over 10 conv layers (QCNN-256; SURVEY.md §2a C7
sweep) — instead of round 1's smaller mixed 32/64 stack, so `value` is not
comparable with BENCH_r01. At this width the per-layer "auto" routing runs
the 10-multiplication Hamilton scheme (10 full real convs, 10/16 the MXU
FLOPs of the reference's 4x-expanded conv), which is where the quaternion
dividend shows up as wall-clock, not just parameters.

Measurement method (important on the axon TPU tunnel): `block_until_ready`
does NOT actually synchronize on this backend and per-dispatch queueing
distorts loop timing, so each measured unit is ONE jit-compiled
`lax.scan` of n chained train steps ending in a scalar loss that is fetched
to the host (a real sync, ~30 ms RTT). Step time is the difference quotient
    dt = (T(n_big) - T(n_small)) / (n_big - n_small)
which cancels the RTT and any queue-fill transient; arms are interleaved
(ABAB) across repeats and medians taken to shed pool drift.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _make_batch(b, t, f, vocab, max_l, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "features": rng.randn(b, t, f, 4).astype(np.float32),
        "feature_lengths": np.full((b,), t, np.int32),
        "labels": rng.randint(1, vocab, size=(b, max_l)).astype(np.int32),
        "label_lengths": np.full((b,), max_l, np.int32),
    }


class _Arm:
    """One model config under test: n chained train steps inside one jit.

    The loop bound is a *traced* fori_loop argument so each arm compiles
    exactly once (remote compiles through the tunnel are the dominant cost).
    """

    def __init__(self, cfg, batch, lengths=(4, 24)):
        import jax
        import jax.numpy as jnp

        from qasr.train.state import build_model, build_optimizer, create_train_state
        from qasr.train.step import make_loss_fn

        self._jax = jax
        self.lengths = lengths
        model = build_model(cfg)
        tx = build_optimizer(cfg)
        loss_fn = make_loss_fn(cfg, model)
        self.state = create_train_state(cfg, jax.random.PRNGKey(0), batch["features"])
        self.batch = {k: jnp.asarray(v) for k, v in batch.items()}

        def one_step(state, batch):
            rng = jax.random.fold_in(state.dropout_rng, state.step)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng, True
            )
            return state.apply_gradients(grads, tx), loss

        @jax.jit
        def chain(state, batch, n):
            def body(_, carry):
                s, _loss = carry
                return one_step(s, batch)

            _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
            return loss

        self._chain = chain
        float(chain(self.state, self.batch, 1))  # single compile + warm

    def timed(self, n) -> float:
        t0 = time.perf_counter()
        loss = float(self._chain(self.state, self.batch, n))  # host fetch = sync
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), f"non-finite loss {loss}"
        return dt


def bench_arms(arms: dict, *, repeats=5) -> dict:
    from qasr.utils.profiling import steady_state_times

    return steady_state_times(
        {name: (arm.timed, arm.lengths) for name, arm in arms.items()},
        repeats=repeats,
    )


def _rel_rms(got, want):
    import jax.numpy as jnp

    got = got.astype(jnp.float32)
    want = want.astype(jnp.float32)
    return float(
        jnp.sqrt(jnp.mean((got - want) ** 2) / jnp.maximum(jnp.mean(want**2), 1e-30))
    )


def mosaic_gate():
    """Real-TPU parity gate for every Pallas conv kernel: fwd AND grads, two
    aligned shapes plus an unaligned-Cout case through the wrapper pad path.

    Tolerance: the measured bf16 output error of the rank-8 scheme at C=128
    is 0.83% RMS of signal (docs/performance.md); the gate allows 5x that
    relative RMS — a genuine Mosaic numeric regression (wrong tap, dropped
    product, bad relayout) lands orders of magnitude above it, while dtype-
    level noise stays well inside.
    """
    import jax
    import jax.numpy as jnp

    from qasr.ops.pallas import qconv_chain
    from qasr.ops.pallas.qconv_ft import (
        qconv2d_ft8_stacked,
        qconv2d_ft_stacked,
        qconv_fast8_stacked,
        qconv_fast10_stacked,
    )

    tol = 5 * 0.0083

    def check(name, got, want):
        r = _rel_rms(got, want)
        assert r < tol, f"Mosaic {name} parity fail: rel RMS {r:.4f} >= {tol}"

    def grads(fn, xs, wq):
        return jax.jit(
            jax.grad(lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2),
                     argnums=(0, 1))
        )(xs, wq)

    for cin, cout in ((128, 128), (256, 256), (128, 192)):
        kx, kw = jax.random.split(jax.random.PRNGKey(cin + cout))
        xs = jax.random.normal(kx, (2, 4, 13, 64, cin), jnp.bfloat16) * 0.5
        wq = jax.random.normal(kw, (4, 3, 3, cin, cout), jnp.bfloat16) * 0.05
        ref10 = qconv_fast10_stacked(xs, wq)
        check(f"ft10 fwd {cin}->{cout}", jax.jit(qconv2d_ft_stacked)(xs, wq), ref10)
        check(f"ft8 fwd {cin}->{cout}", jax.jit(qconv2d_ft8_stacked)(xs, wq), ref10)
        if cout % 128 == 0:
            # grads too; the dx kernel needs lane-aligned dy channels (the
            # unaligned-cout case is fwd-only via the wrapper pad path —
            # QConv gates the fused variants on cout % 128 == 0, so an
            # unaligned dx is unreachable from the model)
            gx, gw = grads(qconv2d_ft8_stacked, xs, wq)
            rx, rw = grads(qconv_fast8_stacked, xs, wq)
            check(f"ft8 dx {cin}->{cout}", gx, rx)
            check(f"ft8 dW {cin}->{cout}", gw, rw)

    # chain-resident kernel: 2-layer value + full grad set vs the XLA
    # stacked composition (covers fwd epilogue, dx kernel, fused PReLU bwd)
    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    t, c = 64, 128
    x = jax.random.normal(keys[0], (1, 4, 5, t, c), jnp.bfloat16) * 0.5
    w1 = jax.random.normal(keys[1], (4, 3, 3, c, c), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(keys[2], (4, 3, 3, c, c), jnp.bfloat16) * 0.05
    b1 = jax.random.normal(keys[3], (4 * c,), jnp.bfloat16) * 0.1
    b2 = jax.random.normal(keys[4], (4 * c,), jnp.bfloat16) * 0.1
    a1 = jnp.abs(jax.random.normal(keys[5], (4 * c,), jnp.bfloat16)) * 0.25

    def prelu(v, alpha):
        a = alpha.reshape(4, 1, 1, -1).astype(v.dtype)
        return jnp.where(v >= 0, v, a * v)

    def loss_chain(x, w1, b1, a1, w2, b2):
        xp = qconv_chain.chain_entry(x, 3)
        z = qconv_chain.chain_layer(xp, w1, b1, None, t_valid=t)
        z = qconv_chain.chain_layer(z, w2, b2, a1, t_valid=t)
        out = qconv_chain.chain_exit(z, 5, t, 3)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(x, w1, b1, a1, w2, b2):
        z1 = qconv_fast8_stacked(x, w1) + b1.reshape(4, 1, 1, -1)
        z2 = qconv_fast8_stacked(prelu(z1, a1), w2) + b2.reshape(4, 1, 1, -1)
        return jnp.sum(z2.astype(jnp.float32) ** 2)

    args = (x, w1, b1, a1, w2, b2)
    v1, g1 = jax.jit(jax.value_and_grad(loss_chain, argnums=tuple(range(6))))(*args)
    v2, g2 = jax.jit(jax.value_and_grad(loss_ref, argnums=tuple(range(6))))(*args)
    assert abs(v1 - v2) / max(abs(v2), 1e-30) < tol, f"chain value {v1} vs {v2}"
    for got, want, nm in zip(g1, g2, ("x", "w1", "b1", "a1", "w2", "b2")):
        check(f"chain grad {nm}", got, want)

    # rank-8 in-VMEM-combo GEMM (qgemm8.py): fwd + both grads vs the block
    # qdense, covering both tile branches (small-K / large-K) and both dW
    # formulations (block / rank-8, switched at k*n >= 1M)
    from qasr.ops.pallas.qgemm8 import qdense_pallas8
    from qasr.ops.qlinalg import qdense as _qdense_blk

    for mg, kg, ng in ((256, 256, 128), (64, 1152, 896)):
        kx, kw = jax.random.split(jax.random.PRNGKey(mg + kg))
        xg = jax.random.normal(kx, (mg, 4 * kg), jnp.bfloat16) * 0.3
        wg = jax.random.normal(kw, (4, kg, ng), jnp.bfloat16) * 0.05
        check(
            f"qgemm8 fwd K{kg}",
            jax.jit(qdense_pallas8)(xg, wg),
            jax.jit(_qdense_blk)(xg, wg),
        )
        gxp, gwp = grads(lambda x_, w_: qdense_pallas8(x_, w_), xg, wg)
        gxr, gwr = grads(lambda x_, w_: _qdense_blk(x_, w_), xg, wg)
        check(f"qgemm8 dx K{kg}", gxp, gxr)
        check(f"qgemm8 dW K{kg}", gwp, gwr)

    # scan-resident QLSTM recurrence (qlstm_scan.py): fwd + all param grads
    # vs the XLA rank-8 in-scan path with shared params and ragged lengths.
    # Tolerance is looser than the conv gates: the kernel's in-step compute
    # is f32 where the XLA scan's elementwise path is bf16, and the
    # recurrence compounds that over T — a real Mosaic regression (wrong
    # slice, dropped product, bad relayout) still lands orders above.
    from qasr.models.qlstm import QBiLSTM

    qtol = 0.06
    bq, tq, hq = 2, 24, 128
    xq = jax.random.normal(jax.random.PRNGKey(7), (bq, tq, 4 * 2 * hq)) * 0.5
    xq = xq.astype(jnp.bfloat16)
    lens = jnp.asarray([tq, tq - 7], jnp.int32)
    ref_m = QBiLSTM(hq, dtype=jnp.bfloat16, recurrent="fast8")
    pal_m = QBiLSTM(hq, dtype=jnp.bfloat16, recurrent="pallas8")
    pq = ref_m.init(jax.random.PRNGKey(8), xq, lens)

    def qloss(m):
        return lambda p_: jnp.sum(
            m.apply(p_, xq, lens).astype(jnp.float32) ** 2
        )

    y_ref = jax.jit(lambda p_: ref_m.apply(p_, xq, lens))(pq)
    y_pal = jax.jit(lambda p_: pal_m.apply(p_, xq, lens))(pq)
    r = _rel_rms(y_pal, y_ref)
    assert r < qtol, f"Mosaic qlstm_scan fwd parity fail: rel RMS {r:.4f}"
    gq_ref = jax.jit(jax.grad(qloss(ref_m)))(pq)
    gq_pal = jax.jit(jax.grad(qloss(pal_m)))(pq)
    for (kp, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(gq_ref),
        jax.tree_util.tree_leaves_with_path(gq_pal),
    ):
        r = _rel_rms(b_, a)
        assert r < qtol, (
            f"Mosaic qlstm_scan grad parity fail at "
            f"{jax.tree_util.keystr(kp)}: rel RMS {r:.4f}"
        )


def main():
    import jax

    try:  # persistent compile cache: later rounds skip the remote compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/qasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from qasr.configs import get_config

    if jax.default_backend() == "tpu":
        # Real-TPU Mosaic regression gate: the Pallas kernels only lower for
        # real through benchmarks, so compile + parity-check them here where
        # the driver runs every round (tests run in interpret mode on CPU; a
        # Mosaic-level regression would otherwise pass CI). Gated on ==
        # "tpu": the kernels are TPU-only and would crash a GPU backend.
        mosaic_gate()

    b, t, f = 16, 256, 40
    frame_s = 0.010
    base = get_config("timit_qcnn").override(
        **{"train.num_steps": 100, "data.batch_size": b}
    )
    batch = _make_batch(b, t, f, base.model.vocab, 48)

    arms = {
        "qcnn": _Arm(base, batch),
        "real_cnn": _Arm(base.override(**{"model.arch": "real_cnn"}), batch),
    }
    times = bench_arms(arms)

    n_chips = jax.device_count()
    audio_s = b * t * frame_s
    ours = audio_s / times["qcnn"] / n_chips
    baseline = audio_s / times["real_cnn"] / n_chips

    # %-of-roofline (the BASELINE.json kernel metric): conv MXU FLOPs the
    # QCNN step actually needs, counted at the reference's computation
    # strategy (16 block products == the 4x-expanded real conv, SURVEY.md
    # §3.2), divided by step time and chip peak. Values above 100% of the
    # *executed* FLOP ceiling are impossible; values toward/above the
    # per-pass shares here reflect the rank-8 scheme executing 8/16 of the
    # reference's FLOPs (docs/performance.md derivation and per-pass table).
    from qasr.utils.profiling import CHIPS, qconv_flops

    cfg_m = base.model
    f_pooled = f
    conv_flops_expanded = 0
    layer0_flops = 0
    cin = 1
    for i, feats in enumerate(cfg_m.conv_features):
        lf = qconv_flops(b, t, f_pooled, cin, feats)
        conv_flops_expanded += lf
        if i == 0:
            layer0_flops = lf
        if i + 1 == cfg_m.pool_after:
            f_pooled = f_pooled // cfg_m.pool_size
        cin = feats
    # fwd + dx + dW each cost one conv pass, except dx is absent for the
    # input layer (no gradient flows to the features)
    step_flops_expanded = 3 * conv_flops_expanded - layer0_flops
    peak = CHIPS["v5e"].peak_bf16_tflops * 1e12
    pct = 100.0 * step_flops_expanded / times["qcnn"] / peak / n_chips

    print(
        json.dumps(
            {
                "metric": "train_throughput_timit_qcnn",
                "value": round(ours, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(ours / baseline, 3),
                "pct_of_expanded_conv_roofline": round(pct, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
