"""Chain-resident fused conv (qconv_chain.py) parity tests — interpret mode.

The chain layer computes ``z = qconv(prelu_alpha(x), w) + b`` with the whole
stack resident in one margin-padded buffer; these tests pin its value and
gradient semantics against the XLA stacked composition the production path
uses (SURVEY.md §4 test 2 strategy: op parity vs an oracle on CPU; Mosaic
lowering is gated on the real TPU by bench.py each round).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.pallas import qconv_chain
from qasr.ops.pallas.qconv_ft import qconv_fast8_stacked, qconv_fast10_stacked


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


C = 128  # the chain kernel's channel-tile contract (supported() gate)


def _rand(key, shape, scale=1.0):
    return jax.random.normal(key, shape, jnp.float32) * scale


def _prelu(x, alpha):
    a = alpha.reshape(4, 1, 1, -1).astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _ref_layer(x_st, w, bias, alpha, scheme):
    """Reference composition on the stacked layout (the production path)."""
    fn = qconv_fast8_stacked if scheme == "fast8" else qconv_fast10_stacked
    xin = _prelu(x_st, alpha) if alpha is not None else x_st
    z = fn(xin, w)
    return z + bias.reshape(4, 1, 1, -1).astype(z.dtype)


def _chain_forward(x_st, ws, biases, alphas, scheme):
    """Run a chain of layers through the resident path; returns stacked z."""
    b, _, f, t, _ = x_st.shape
    kw = ws[0].shape[2]
    xp = qconv_chain.chain_entry(x_st, kw)
    prev_alpha = None
    for w, bias, alpha in zip(ws, biases, alphas):
        xp = qconv_chain.chain_layer(
            xp, w, bias, prev_alpha, t_valid=t, scheme=scheme
        )
        prev_alpha = alpha
    return qconv_chain.chain_exit(xp, f, t, kw)


class TestChainLayer:
    @pytest.mark.parametrize("scheme", ["fast8", "fast10"])
    @pytest.mark.parametrize("t", [32, 40])  # tile-exact and masked tail
    def test_single_layer_matches_stacked(self, scheme, t):
        kx, kw_, kb = jax.random.split(jax.random.PRNGKey(t), 3)
        x = _rand(kx, (1, 4, 5, t, C), 0.5)
        w = _rand(kw_, (4, 3, 3, C, C), 0.05)
        bias = _rand(kb, (4 * C,), 0.1)
        got = _chain_forward(x, [w], [bias], [None], scheme)
        want = _ref_layer(x, w, bias, None, scheme)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_two_layer_chain_with_prologue(self):
        keys = jax.random.split(jax.random.PRNGKey(7), 6)
        t = 40
        x = _rand(keys[0], (2, 4, 5, t, C), 0.5)
        w1 = _rand(keys[1], (4, 3, 3, C, C), 0.05)
        w2 = _rand(keys[2], (4, 3, 3, C, C), 0.05)
        b1 = _rand(keys[3], (4 * C,), 0.1)
        b2 = _rand(keys[4], (4 * C,), 0.1)
        a1 = jnp.abs(_rand(keys[5], (4 * C,), 0.25))
        got = _chain_forward(x, [w1, w2], [b1, b2], [a1, None], "fast8")
        z1 = _ref_layer(x, w1, b1, None, "fast8")
        want = _ref_layer(z1, w2, b2, a1, "fast8")
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_buffer_invariants(self):
        """Margins and rows past t_valid must come back exactly zero — the
        output buffer is the next layer's SAME padding."""
        kx, kw_, kb = jax.random.split(jax.random.PRNGKey(3), 3)
        t = 40
        x = _rand(kx, (1, 4, 5, t, C), 0.5)
        w = _rand(kw_, (4, 3, 3, C, C), 0.05)
        bias = _rand(kb, (4 * C,), 0.5)  # bias != 0: masking must beat it
        xp = qconv_chain.chain_entry(x, 3)
        z = qconv_chain.chain_layer(xp, w, bias, None, t_valid=t)
        z = np.asarray(z)
        tt = qconv_chain._TT
        assert (z[:, :, 0] == 0).all() and (z[:, :, -1] == 0).all()  # F margins
        assert (z[:, :, :, :tt] == 0).all()          # lead time margin
        assert (z[:, :, :, tt + t :] == 0).all()     # mask + tail margin

    @pytest.mark.parametrize("negative_alpha", [False, True])
    def test_grads_match_stacked_composition(self, negative_alpha):
        """d/d{x, w1, b1, a1, w2, b2} of a 2-layer chain == the stacked
        composition's grads (covers the fused PReLU backward + dalpha
        accumulation, including alpha < 0 where y>0 can't recover z>0)."""
        keys = jax.random.split(jax.random.PRNGKey(11), 6)
        t = 40
        x = _rand(keys[0], (1, 4, 5, t, C), 0.5)
        w1 = _rand(keys[1], (4, 3, 3, C, C), 0.05)
        w2 = _rand(keys[2], (4, 3, 3, C, C), 0.05)
        b1 = _rand(keys[3], (4 * C,), 0.1)
        b2 = _rand(keys[4], (4 * C,), 0.1)
        a1 = _rand(keys[5], (4 * C,), 0.25)
        if not negative_alpha:
            a1 = jnp.abs(a1)

        def loss_chain(x, w1, b1, a1, w2, b2):
            z = _chain_forward(x, [w1, w2], [b1, b2], [a1, None], "fast8")
            return jnp.sum(z * jnp.sin(0.3 * z))

        def loss_ref(x, w1, b1, a1, w2, b2):
            z1 = _ref_layer(x, w1, b1, None, "fast8")
            z2 = _ref_layer(z1, w2, b2, a1, "fast8")
            return jnp.sum(z2 * jnp.sin(0.3 * z2))

        args = (x, w1, b1, a1, w2, b2)
        g1 = jax.grad(loss_chain, argnums=tuple(range(6)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        for got, want, name in zip(
            g1, g2, ["x", "w1", "b1", "a1", "w2", "b2"]
        ):
            np.testing.assert_allclose(
                got, want, rtol=2e-3, atol=2e-3, err_msg=f"grad {name}"
            )

    def test_wide_channel_grads(self):
        """C=256 (two channel tiles): the dx kernel's alpha/z tiling along
        the Cin grid axis must line up (a full-width alpha broke here)."""
        keys = jax.random.split(jax.random.PRNGKey(21), 4)
        t, c = 32, 256
        x = _rand(keys[0], (1, 4, 3, t, c), 0.5)
        w = _rand(keys[1], (4, 3, 3, c, c), 0.05)
        b1 = _rand(keys[2], (4 * c,), 0.1)
        a1 = _rand(keys[3], (4 * c,), 0.25)

        def loss_chain(x, w, b1, a1):
            xp = qconv_chain.chain_entry(x, 3)
            z = qconv_chain.chain_layer(xp, w, b1, a1, t_valid=t)
            out = qconv_chain.chain_exit(z, 3, t, 3)
            return jnp.sum(out**2)

        def loss_ref(x, w, b1, a1):
            z = _ref_layer(_prelu(x, a1), w, b1, None, "fast8")
            return jnp.sum(z**2)

        args = (x, w, b1, a1)
        g1 = jax.grad(loss_chain, argnums=(0, 1, 2, 3))(*args)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        for got, want, name in zip(g1, g2, ["x", "w", "b", "a"]):
            np.testing.assert_allclose(
                got, want, rtol=2e-3, atol=2e-3, err_msg=f"grad {name}"
            )

    def test_chain_layer_is_bf16_safe(self):
        """bf16 in/out parity at moderate scale (the production dtype)."""
        kx, kw_, kb = jax.random.split(jax.random.PRNGKey(9), 3)
        t = 40
        x = (_rand(kx, (1, 4, 5, t, C), 0.5)).astype(jnp.bfloat16)
        w = (_rand(kw_, (4, 3, 3, C, C), 0.05)).astype(jnp.bfloat16)
        bias = (_rand(kb, (4 * C,), 0.1)).astype(jnp.bfloat16)
        got = _chain_forward(x, [w], [bias], [None], "fast8").astype(jnp.float32)
        want = _ref_layer(x, w, bias, None, "fast8").astype(jnp.float32)
        rms = float(jnp.sqrt(jnp.mean((got - want) ** 2) / jnp.mean(want**2)))
        assert rms < 0.03, rms

    def test_supported_gate(self):
        assert qconv_chain.supported(128, 256, (3, 3), "SAME", None)
        assert not qconv_chain.supported(128, 256, (3, 3), "VALID", None)
        assert not qconv_chain.supported(64, 256, (3, 3), "SAME", None)
        assert not qconv_chain.supported(128, 192, (3, 3), "SAME", None)
        assert not qconv_chain.supported(128, 256, (2, 3), "SAME", None)
        assert not qconv_chain.supported(128, 256, (3, 3), "SAME", (2, 1))


class TestModelIntegration:
    """variant="fusedchain8" must be a drop-in for "stacked8": same param
    tree, matching outputs/grads for shared params, and the chain must
    actually engage on the fat post-pool layers."""

    def _build(self, variant, conv_features=(8, 128, 128, 128)):
        from qasr.models.qcnn import QCNNEncoder

        return QCNNEncoder(
            variant=variant,
            conv_features=conv_features,
            dense_features=(16,),
            vocab=12,
            pool_after=1,
            dropout_rate=0.0,
            dtype=jnp.bfloat16,
        )

    def test_chain_engages_and_matches_stacked(self, monkeypatch):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 40, 4))
        m_st = self._build("stacked8")
        p = m_st.init(jax.random.PRNGKey(1), x, train=False)["params"]
        y_st = np.asarray(m_st.apply({"params": p}, x, train=False))

        calls = []
        real = qconv_chain.chain_layer

        def counting(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(qconv_chain, "chain_layer", counting)
        m_fc = self._build("fusedchain8")
        p_fc = m_fc.init(jax.random.PRNGKey(1), x, train=False)["params"]
        assert jax.tree_util.tree_map(lambda a: a.shape, p_fc) == \
            jax.tree_util.tree_map(lambda a: a.shape, p)
        y_fc = np.asarray(m_fc.apply({"params": p}, x, train=False))
        assert len(calls) >= 2, "fused chain never engaged"
        rms = float(np.sqrt(np.mean((y_fc - y_st) ** 2) /
                            max(np.mean(y_st**2), 1e-30)))
        assert rms < 0.05, rms

    def test_grads_match_stacked(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 40, 4))
        m_st = self._build("stacked8")
        m_fc = self._build("fusedchain8")
        p = m_st.init(jax.random.PRNGKey(1), x, train=False)["params"]

        def loss(m):
            return lambda p_: jnp.sum(
                m.apply({"params": p_}, x, train=False) ** 2
            )

        g_st = jax.grad(loss(m_st))(p)
        g_fc = jax.grad(loss(m_fc))(p)
        flat_st = jax.tree_util.tree_leaves_with_path(g_st)
        flat_fc = jax.tree_util.tree_leaves(g_fc)
        for (path, a), b in zip(flat_st, flat_fc):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            denom = max(float(np.sqrt(np.mean(a**2))), 1e-6)
            rms = float(np.sqrt(np.mean((a - b) ** 2))) / denom
            assert rms < 0.08, f"{jax.tree_util.keystr(path)}: rel RMS {rms}"

    def test_thin_layer_after_fat_exits_chain(self):
        """conv_features=(8,128,128,8): the trailing thin layer must leave
        the chain/stacked layout and still match the legacy routing."""
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 40, 4))
        m_leg = self._build("legacy_auto", (8, 128, 128, 8))
        p = m_leg.init(jax.random.PRNGKey(1), x, train=False)["params"]
        y_leg = np.asarray(m_leg.apply({"params": p}, x, train=False))
        for variant in ("stacked8", "fusedchain8"):
            m = self._build(variant, (8, 128, 128, 8))
            y = np.asarray(m.apply({"params": p}, x, train=False))
            rms = float(np.sqrt(np.mean((y - y_leg) ** 2) /
                                max(np.mean(y_leg**2), 1e-30)))
            assert rms < 0.05, f"{variant}: {rms}"
