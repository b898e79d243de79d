"""Distributed tests on the 8-device fake CPU mesh (SURVEY.md §4 test 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from qasr.configs import get_config
from qasr.data import SyntheticDataset, epoch_iterator
from qasr.parallel import (
    MODEL_AXIS,
    create_sharded_train_state,
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
    tree_shardings,
)
from qasr.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def cfg():
    return get_config("tiny_synthetic").override(**{"train.num_steps": 10})


@pytest.fixture(scope="module")
def batch(cfg):
    ds = SyntheticDataset(
        vocab=cfg.model.vocab, n_mels=cfg.data.n_mels, num_examples=16, seed=0
    )
    return next(iter(epoch_iterator(ds, cfg.data, train=False)))


class TestMesh:
    def test_devices(self):
        assert jax.device_count() == 8

    def test_make_mesh_shapes(self):
        m = make_mesh()  # 8x1
        assert m.shape == {"data": 8, "model": 1}
        m = make_mesh(-1, 2)
        assert m.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(3, 2)

    def test_mesh_config_shapes_mesh(self):
        """MeshConfig.data_axis / model_axis must actually shape the mesh."""
        from qasr.configs import get_config
        from qasr.train.loop import build_mesh_from_config

        cfg = get_config("tiny_synthetic")
        assert build_mesh_from_config(cfg).shape == {"data": 8, "model": 1}
        cfg2 = cfg.override(**{"mesh.model_axis": "2"})
        assert build_mesh_from_config(cfg2).shape == {"data": 4, "model": 2}
        # explicit DP extent: mesh takes exactly data_axis*model_axis devices
        cfg3 = cfg.override(**{"mesh.data_axis": "2", "mesh.model_axis": "2"})
        m = build_mesh_from_config(cfg3)
        assert m.shape == {"data": 2, "model": 2}
        assert len(m.devices.reshape(-1)) == 4
        # overshooting the slice is an error, not silent clamping
        cfg4 = cfg.override(**{"mesh.data_axis": "16"})
        with pytest.raises(ValueError, match="needs 16 devices"):
            build_mesh_from_config(cfg4)
        # model_axis clamps to a divisor of the device count (presets run
        # anywhere), and data_axis=-1 takes the remainder
        cfg5 = cfg.override(**{"mesh.model_axis": "3"})
        assert build_mesh_from_config(cfg5).shape == {"data": 4, "model": 2}


class TestShardingRules:
    def test_kernel_sharded_on_cout(self, cfg, batch):
        mesh = make_mesh(-1, 2)
        state, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        k_sh = sh.params["qconv_0"]["kernel"]
        assert k_sh.spec == P(None, None, None, None, MODEL_AXIS)
        # the realized array is actually sharded
        arr = state.params["qconv_0"]["kernel"]
        assert len({d for d in arr.sharding.device_set}) == 8
        # optimizer moments follow the same rule
        # (find a kernel leaf inside opt_state with the same spec)
        specs = [
            s.spec
            for p, s in jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
            if "kernel" in str(p)
        ]
        assert P(None, None, None, None, MODEL_AXIS) in specs

    def test_bias_replicated(self, cfg, batch):
        mesh = make_mesh(-1, 2)
        _, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        assert sh.params["qconv_0"]["bias"].spec == P()

    def test_indivisible_dim_falls_back_replicated(self, cfg, batch):
        # output kernel [.., vocab=12]: 12 % 8 != 0 -> falls back replicated
        mesh = make_mesh(1, 8)
        _, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        assert sh.params["output"]["kernel"].spec == P()


class TestShardedTraining:
    def test_dp_step_matches_single_device(self, cfg, batch):
        """The SPMD DP step must compute the same update as single-device."""
        mesh = make_mesh(8, 1)
        state_s, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        step_s = make_sharded_train_step(cfg, mesh, sh, batch)
        sharded_batch = shard_batch(mesh, batch)
        new_s, m_s = step_s(state_s, sharded_batch)

        state_1 = create_train_state(cfg, jax.random.PRNGKey(0), batch["features"])
        step_1 = make_train_step(cfg)
        new_1, m_1 = step_1(state_1, dict(batch))

        np.testing.assert_allclose(float(m_s["loss"]), float(m_1["loss"]), rtol=1e-5)
        k_s = np.asarray(new_s.params["qconv_0"]["kernel"])
        k_1 = np.asarray(new_1.params["qconv_0"]["kernel"])
        np.testing.assert_allclose(k_s, k_1, rtol=1e-4, atol=1e-5)

    def test_dp_tp_step_runs_and_matches(self, cfg, batch):
        mesh = make_mesh(4, 2)
        state_s, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        step_s = make_sharded_train_step(cfg, mesh, sh, batch)
        new_s, m_s = step_s(state_s, shard_batch(mesh, batch))

        state_1 = create_train_state(cfg, jax.random.PRNGKey(0), batch["features"])
        new_1, m_1 = make_train_step(cfg)(state_1, dict(batch))
        np.testing.assert_allclose(float(m_s["loss"]), float(m_1["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_s.params["qdense_0"]["kernel"]),
            np.asarray(new_1.params["qdense_0"]["kernel"]),
            rtol=1e-4, atol=1e-5,
        )

    def test_multi_step_training_decreases_loss(self, cfg, batch):
        mesh = make_mesh(4, 2)
        state, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        step = make_sharded_train_step(cfg, mesh, sh, batch)
        sb = shard_batch(mesh, batch)
        losses = []
        for _ in range(30):
            state, m = step(state, sb)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

    def test_eval_step_sharded(self, cfg, batch):
        mesh = make_mesh(8, 1)
        state, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        ev = make_sharded_eval_step(cfg, mesh, sh, batch)
        out = ev(state.params, shard_batch(mesh, batch))
        assert out["decoded"].shape[0] == batch["features"].shape[0]
        assert np.isfinite(float(out["loss"]))


class TestCollectives:
    def test_aggregate_per_single_process(self):
        from qasr.parallel import aggregate_per

        assert aggregate_per(3, 10) == (3, 10)


class TestSeqParallelConv:
    """P3: time-axis sharded conv with ppermute halo exchange."""

    def test_matches_global_conv(self):
        from qasr.parallel.seq_parallel import qconv2d_seq_parallel
        from qasr.ops.qlinalg import qconv

        mesh = make_mesh(8, 1)
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (2, 64, 9, 4 * 3))  # T=64 over 8 shards
        w = jax.random.normal(kw, (4, 3, 3, 3, 5))
        got = qconv2d_seq_parallel(x, w, mesh, axis="data")
        want = qconv(x, w, padding="SAME")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_5x5_kernel_and_grad(self):
        from qasr.parallel.seq_parallel import qconv2d_seq_parallel
        from qasr.ops.qlinalg import qconv

        mesh = make_mesh(4, 2)
        kx, kw = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (1, 32, 7, 4 * 2))
        w = jax.random.normal(kw, (4, 5, 5, 2, 2))
        got = qconv2d_seq_parallel(x, w, mesh, axis="data")
        want = qconv(x, w, padding="SAME")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

        g1 = jax.grad(lambda w: jnp.sum(qconv2d_seq_parallel(x, w, mesh, axis="data") ** 2))(w)
        g2 = jax.grad(lambda w: jnp.sum(qconv(x, w) ** 2))(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3)

    def test_even_kernel_rejected(self):
        from qasr.parallel.seq_parallel import qconv2d_seq_parallel

        mesh = make_mesh(8, 1)
        with pytest.raises(ValueError, match="odd"):
            qconv2d_seq_parallel(
                jnp.ones((1, 8, 4, 4)), jnp.ones((4, 2, 3, 1, 1)), mesh
            )

    def test_fast8_variant_matches_global_conv(self):
        """The production rank-8 stacked scheme must compose with the halo
        exchange (value AND grads): long-utterance time-sharding should not
        pay the 16-product block expansion (round-3 weak #4)."""
        from qasr.ops.qlinalg import qconv
        from qasr.parallel.seq_parallel import qconv2d_seq_parallel

        mesh = make_mesh(4, 2)
        kx, kw = jax.random.split(jax.random.PRNGKey(5))
        x = jax.random.normal(kx, (2, 32, 7, 4 * 3))
        w = jax.random.normal(kw, (4, 3, 3, 3, 5)) * 0.3
        got = qconv2d_seq_parallel(x, w, mesh, axis="data", variant="fast8")
        want = qconv(x, w, padding="SAME")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )
        g1 = jax.grad(
            lambda w_: jnp.sum(
                qconv2d_seq_parallel(x, w_, mesh, axis="data", variant="fast8")
                ** 2
            )
        )(w)
        g2 = jax.grad(lambda w_: jnp.sum(qconv(x, w_) ** 2))(w)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3
        )

    def test_auto_routes_fast8_at_fat_widths(self):
        from qasr.parallel import seq_parallel

        mesh = make_mesh(2, 4)
        kx, kw = jax.random.split(jax.random.PRNGKey(6))
        x = jax.random.normal(kx, (1, 16, 5, 4 * 128), jnp.float32)
        w = jax.random.normal(kw, (4, 3, 3, 128, 128)) * 0.05
        called = {}
        real = seq_parallel.qconv

        def spy_block(*a, **k):
            called["block"] = True
            return real(*a, **k)

        seq_parallel.qconv = spy_block
        try:
            got = seq_parallel.qconv2d_seq_parallel(x, w, mesh, axis="data")
        finally:
            seq_parallel.qconv = real
        assert "block" not in called, "auto at C=128 must take the fast8 path"
        want = real(x, w, padding="SAME")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )


class TestSeqParallelCTC:
    """Chunked-scan CTC with time-sharded logits vs the unsharded loss."""

    def _data(self, b=4, t=64, v=13, l=9, seed=0):
        rng = np.random.RandomState(seed)
        logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32))
        labels = jnp.asarray(rng.randint(1, v, size=(b, l)).astype(np.int32))
        logit_lengths = jnp.asarray([t, t - 7, t // 2, 11], np.int32)
        label_lengths = jnp.asarray([l, l - 3, 4, 1], np.int32)
        return logits, labels, logit_lengths, label_lengths

    def test_matches_unsharded_loss(self):
        from qasr.ops.ctc import ctc_loss
        from qasr.parallel.seq_parallel import ctc_loss_seq_parallel

        mesh = make_mesh(8, 1)
        args = self._data()
        ref = ctc_loss(*args)
        got = ctc_loss_seq_parallel(*args, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)

    def test_grads_match(self):
        from qasr.ops.ctc import ctc_loss
        from qasr.parallel.seq_parallel import ctc_loss_seq_parallel

        mesh = make_mesh(4, 2)  # time sharded over "data"=4, model axis idle
        logits, labels, ll, tl = self._data(t=32)

        g_ref = jax.grad(lambda x: ctc_loss(x, labels, ll, tl).sum())(logits)
        g_sp = jax.grad(
            lambda x: ctc_loss_seq_parallel(x, labels, ll, tl, mesh).sum()
        )(logits)
        np.testing.assert_allclose(
            np.asarray(g_sp), np.asarray(g_ref), rtol=1e-4, atol=1e-6
        )

    def test_indivisible_t_rejected(self):
        from qasr.parallel.seq_parallel import ctc_loss_seq_parallel

        mesh = make_mesh(8, 1)
        logits, labels, ll, tl = self._data(t=60)
        with pytest.raises(ValueError, match="divisible"):
            ctc_loss_seq_parallel(logits, labels, ll, tl, mesh)


class TestShardedBeamDecode:
    """DP-sharded prefix beam decode == unsharded beam decode (R4 multi-host)."""

    def test_matches_unsharded_beam(self, cfg, batch):
        from qasr.decode.beam import ctc_beam_search_decode
        from qasr.parallel import make_sharded_beam_decode_step
        from qasr.train.state import build_model

        mesh = make_mesh(8, 1)
        state, shardings = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        beam_step = make_sharded_beam_decode_step(cfg, mesh, shardings, batch)
        out = beam_step(state.params, shard_batch(mesh, batch))

        model = build_model(cfg)
        params = jax.device_get(state.params)
        logits = model.apply(
            {"params": params},
            batch["features"],
            train=False,
            lengths=batch["feature_lengths"],
        )
        seq, lens, score = ctc_beam_search_decode(
            logits,
            batch["feature_lengths"],
            beam_width=cfg.decode.beam_width,
            blank_id=cfg.decode.blank_id,
            max_len=int(cfg.data.max_label_len),
        )
        np.testing.assert_array_equal(np.asarray(out["decoded_lengths"]), np.asarray(lens))
        np.testing.assert_array_equal(np.asarray(out["decoded"]), np.asarray(seq))
        np.testing.assert_allclose(
            np.asarray(out["log_score"]), np.asarray(score), rtol=1e-5
        )


class TestFast10Sharded:
    """The 10-conv Hamilton path under DP x TP GSPMD sharding (the routing
    QConv(variant="auto") picks at >= 128 quaternion channels) must match the
    unsharded op: the 10 product convs see batch-sharded inputs and
    out-channel-sharded kernels, and GSPMD inserts the collectives."""

    def test_qconv_fast10_dp_tp_matches_unsharded(self):
        from jax.sharding import NamedSharding
        from qasr.ops.qlinalg import qconv_fast10

        mesh = make_mesh(2, 4)
        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        x = jax.random.normal(k1, (8, 12, 6, 4 * 128), jnp.float32)
        w = jax.random.normal(k2, (4, 3, 3, 128, 128), jnp.float32) * 0.05

        want = qconv_fast10(x, w)

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(
            w, NamedSharding(mesh, P(None, None, None, None, MODEL_AXIS))
        )
        got = jax.jit(qconv_fast10)(xs, ws)
        # output layout is GSPMD's choice; values must match exactly
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_qconv_fast10_grads_match_under_sharding(self):
        from jax.sharding import NamedSharding
        from qasr.ops.qlinalg import qconv_fast10

        mesh = make_mesh(2, 4)
        k1, k2 = jax.random.split(jax.random.PRNGKey(12))
        x = jax.random.normal(k1, (4, 8, 6, 4 * 128), jnp.float32)
        w = jax.random.normal(k2, (4, 3, 3, 128, 128), jnp.float32) * 0.05

        def loss(x, w):
            return jnp.sum(qconv_fast10(x, w) ** 2) * 1e-4

        gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(
            w, NamedSharding(mesh, P(None, None, None, None, MODEL_AXIS))
        )
        gx2, gw2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, ws)
        np.testing.assert_allclose(
            np.asarray(gx2), np.asarray(gx1), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gw2), np.asarray(gw1), rtol=1e-4, atol=1e-5
        )


class TestStackedChainSharded:
    """The production default path (rank-8 stacked F-major chain) under
    DP x TP sharding must match the single-device step — the tiny fixtures
    above never reach the 128-channel stacked entry gate, so this is the
    only strict parity coverage of the stacked conv chain under a mesh."""

    def test_stacked8_dp_tp_matches_single_device(self):
        cfg = get_config("tiny_synthetic").override(
            **{
                "model.conv_features": "(128, 128)",
                "model.dense_features": "(16,)",
                "data.batch_size": 8,
                "data.bucket_sizes": "(32,)",
                "data.max_label_len": 8,
            }
        )
        ds = SyntheticDataset(
            vocab=cfg.model.vocab,
            n_mels=cfg.data.n_mels,
            num_examples=8,
            seed=0,
            max_labels=4,
            max_dur=4,
        )
        batch = next(iter(epoch_iterator(ds, cfg.data, train=False)))

        mesh = make_mesh(4, 2)
        state_s, sh = create_sharded_train_state(
            cfg, jax.random.PRNGKey(0), batch["features"], mesh
        )
        # the fat layer's kernel really is TP-sharded
        assert sh.params["qconv_1"]["kernel"].spec == P(
            None, None, None, None, MODEL_AXIS
        )
        step_s = make_sharded_train_step(cfg, mesh, sh, batch)
        new_s, m_s = step_s(state_s, shard_batch(mesh, batch))

        state_1 = create_train_state(cfg, jax.random.PRNGKey(0), batch["features"])
        step_1 = make_train_step(cfg)
        new_1, m_1 = step_1(state_1, dict(batch))

        np.testing.assert_allclose(
            float(m_s["loss"]), float(m_1["loss"]), rtol=2e-5, atol=2e-5
        )
        k_s = np.asarray(new_s.params["qconv_1"]["kernel"])
        k_1 = np.asarray(new_1.params["qconv_1"]["kernel"])
        np.testing.assert_allclose(k_s, k_1, rtol=1e-4, atol=1e-4)
