"""CTC loss + greedy decode tests (SURVEY.md §4 test 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qasr.ops.ctc import ctc_greedy_decode, ctc_loss


def _random_case(key, b, t, l, v, blank=0):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = jax.random.normal(k1, (b, t, v))
    labels = jax.random.randint(k2, (b, l), 1, v)  # never blank
    label_lens = jax.random.randint(k3, (b,), 1, l + 1)
    logit_lens = jax.random.randint(k4, (b,), 2 * l + 1, t + 1)
    return logits, labels, logit_lens, label_lens


class TestCTCLoss:
    def test_hand_lattice_t2(self):
        # T=2, V=3 (blank=0), label=[1]: p = p_a1*p_b2 + p_b1*p_a2 + p_a1*p_a2
        logits = jnp.log(
            jnp.array([[[0.5, 0.3, 0.2], [0.1, 0.6, 0.3]]], dtype=jnp.float32)
        )
        p = 0.3 * 0.1 + 0.5 * 0.6 + 0.3 * 0.6
        loss = ctc_loss(
            logits, jnp.array([[1]]), jnp.array([2]), jnp.array([1])
        )
        np.testing.assert_allclose(loss[0], -np.log(p), rtol=1e-5)

    def test_t1_single_label(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 5))
        loss = ctc_loss(logits, jnp.array([[3]]), jnp.array([1]), jnp.array([1]))
        want = -jax.nn.log_softmax(logits[0, 0])[3]
        np.testing.assert_allclose(loss[0], want, rtol=1e-5)

    def test_empty_label_all_blank(self):
        logits = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 5))
        loss = ctc_loss(logits, jnp.zeros((1, 2), jnp.int32), jnp.array([4]), jnp.array([0]))
        want = -jax.nn.log_softmax(logits[0], axis=-1)[:, 0].sum()
        np.testing.assert_allclose(loss[0], want, rtol=1e-5)

    @pytest.mark.parametrize("b,t,l,v", [(4, 20, 5, 8), (2, 50, 12, 30), (3, 7, 3, 4)])
    def test_matches_optax(self, b, t, l, v):
        logits, labels, logit_lens, label_lens = _random_case(
            jax.random.PRNGKey(b * t + v), b, t, l, v
        )
        got = ctc_loss(logits, labels, logit_lens, label_lens)
        logit_pad = (jnp.arange(t)[None] >= logit_lens[:, None]).astype(jnp.float32)
        label_pad = (jnp.arange(l)[None] >= label_lens[:, None]).astype(jnp.float32)
        # optax zeroes padded labels' contribution via paddings; label values in
        # padding must still be non-blank for our impl — keep them as-is.
        want = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_grad_matches_optax(self):
        logits, labels, logit_lens, label_lens = _random_case(
            jax.random.PRNGKey(7), 3, 15, 4, 6
        )
        logit_pad = (jnp.arange(15)[None] >= logit_lens[:, None]).astype(jnp.float32)
        label_pad = (jnp.arange(4)[None] >= label_lens[:, None]).astype(jnp.float32)
        g_ours = jax.grad(lambda lg: ctc_loss(lg, labels, logit_lens, label_lens).sum())(logits)
        g_optax = jax.grad(
            lambda lg: optax.ctc_loss(lg, logit_pad, labels, label_pad).sum()
        )(logits)
        np.testing.assert_allclose(g_ours, g_optax, rtol=1e-3, atol=1e-4)

    def test_jit_and_nonblank_blank_id(self):
        logits, labels, logit_lens, label_lens = _random_case(
            jax.random.PRNGKey(9), 2, 12, 3, 5
        )
        # use blank_id = V-1 (the Keras/TIMIT convention the reference uses)
        labels = jnp.where(labels == 4, 1, labels)  # keep labels != blank
        f = jax.jit(lambda *a: ctc_loss(*a, blank_id=4))
        loss = f(logits, labels, logit_lens, label_lens)
        assert jnp.isfinite(loss).all()

    def test_bf16_logits_f32_lattice(self):
        logits, labels, logit_lens, label_lens = _random_case(
            jax.random.PRNGKey(11), 2, 30, 6, 10
        )
        l32 = ctc_loss(logits, labels, logit_lens, label_lens)
        lbf = ctc_loss(logits.astype(jnp.bfloat16), labels, logit_lens, label_lens)
        assert lbf.dtype == jnp.float32
        np.testing.assert_allclose(l32, lbf, rtol=5e-2, atol=5e-2)

    def test_long_sequence_stability(self):
        # T=1000, L=80: the f32 log-space lattice must stay finite
        logits, labels, logit_lens, label_lens = _random_case(
            jax.random.PRNGKey(13), 2, 1000, 80, 40
        )
        loss = ctc_loss(logits, labels, logit_lens, label_lens)
        assert jnp.isfinite(loss).all()
        assert (loss > 0).all()


def _numpy_collapse(path, length, blank):
    out = []
    prev = None
    for s in path[:length]:
        if s != blank and s != prev:
            out.append(int(s))
        prev = s
    return out


class TestGreedyDecode:
    def test_against_numpy_oracle(self):
        key = jax.random.PRNGKey(3)
        logits = jax.random.normal(key, (5, 30, 7))
        lens = jnp.array([30, 12, 1, 29, 20])
        seqs, out_lens = jax.jit(ctc_greedy_decode)(logits, lens)
        path = np.argmax(np.asarray(logits), axis=-1)
        for i in range(5):
            want = _numpy_collapse(path[i], int(lens[i]), 0)
            got = [int(x) for x in np.asarray(seqs[i][: int(out_lens[i])])]
            assert got == want, f"row {i}: {got} != {want}"
            assert (np.asarray(seqs[i][int(out_lens[i]):]) == -1).all()

    def test_repeat_blank_repeat(self):
        # path a a 0 a b b -> a a b
        v = 3
        path = jnp.array([[1, 1, 0, 1, 2, 2]])
        logits = jax.nn.one_hot(path, v) * 10.0
        seqs, lens = ctc_greedy_decode(logits, jnp.array([6]))
        assert int(lens[0]) == 3
        assert [int(x) for x in seqs[0, :3]] == [1, 1, 2]
