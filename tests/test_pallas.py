"""Pallas kernel parity tests (SURVEY.md §4 test 2) — interpret mode on CPU.

Real-TPU lowering of these kernels is exercised by bench.py and was verified
compiled on the axon TPU v5e; here the kernels run under
`pltpu.force_tpu_interpret_mode()` across shapes (unaligned K, odd M, small
N), dtypes, and grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from qasr.ops.pallas import qconv2d_pallas, qdense_pallas, qgemm
from qasr.ops.qlinalg import qconv, qdense, qconv_expanded_oracle


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class TestQGemm:
    @pytest.mark.parametrize(
        "m,k,n",
        [
            (256, 128, 128),   # aligned
            (300, 130, 96),    # everything unaligned
            (8, 832, 256),     # tiny M, big K
            (512, 64, 32),     # below-tile K/N (kernel still correct)
        ],
    )
    def test_matches_block_path(self, m, k, n):
        kx, kw = jax.random.split(jax.random.PRNGKey(m + k + n))
        x = _rand(kx, (m, 4 * k))
        w = _rand(kw, (4, k, n))
        got = qgemm(x, w)
        want = qdense(x, w)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_grads_match_block_path(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = _rand(kx, (64, 4 * 130))
        w = _rand(kw, (4, 130, 40))
        g1 = jax.grad(lambda x, w: jnp.sum(jnp.sin(qgemm(x, w))), (0, 1))(x, w)
        g2 = jax.grad(lambda x, w: jnp.sum(jnp.sin(qdense(x, w))), (0, 1))(x, w)
        np.testing.assert_allclose(g1[0], g2[0], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(g1[1], g2[1], rtol=1e-3, atol=1e-3)

    def test_batch_dims_wrapper(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(1))
        x = _rand(kx, (2, 7, 4 * 130))
        w = _rand(kw, (4, 130, 40))
        got = qdense_pallas(x, w)
        want = qdense(x, w)
        assert got.shape == (2, 7, 160)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestQConvPallas:
    @pytest.mark.parametrize(
        "spatial,cin,cout,padding",
        [((12, 9), 16, 8, "SAME"), ((8, 8), 4, 4, "VALID"), ((10, 13), 32, 16, "SAME")],
    )
    def test_matches_block_path(self, spatial, cin, cout, padding):
        kx, kw = jax.random.split(jax.random.PRNGKey(cin + cout))
        x = _rand(kx, (2, *spatial, 4 * cin))
        w = _rand(kw, (4, 3, 3, cin, cout))
        got = qconv2d_pallas(x, w, padding=padding)
        want = qconv(x, w, padding=padding)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_matches_expanded_oracle(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(9))
        x = _rand(kx, (1, 9, 9, 4 * 8))
        w = _rand(kw, (4, 3, 3, 8, 8))
        got = qconv2d_pallas(x, w)
        want = qconv_expanded_oracle(x, w)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_strides(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(10))
        x = _rand(kx, (1, 12, 10, 4 * 8))
        w = _rand(kw, (4, 3, 3, 8, 8))
        got = qconv2d_pallas(x, w, strides=(2, 2), padding="VALID")
        want = qconv(x, w, strides=(2, 2), padding="VALID")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_grad_through_conv(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(11))
        x = _rand(kx, (1, 8, 8, 4 * 8))
        w = _rand(kw, (4, 3, 3, 8, 8))
        g1 = jax.grad(lambda w: jnp.sum(qconv2d_pallas(x, w) ** 2))(w)
        g2 = jax.grad(lambda w: jnp.sum(qconv(x, w) ** 2))(w)
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-3)


class TestFtConv:
    """Fused F-major stacked conv (qconv_ft.py) vs the XLA block path —
    both bilinear schemes, SAME stride-1 (the kernel's contract)."""

    @pytest.mark.parametrize(
        "shape",
        [
            (1, 20, 13, 8, 8),
            (2, 16, 9, 4, 4),
            (1, 7, 5, 2, 3),       # T below one tile, tiny dims
            (1, 33, 15, 8, 12),    # odd T crossing the tile boundary
        ],
    )
    @pytest.mark.parametrize("scheme", ["ft10", "ft8"])
    def test_matches_block_path(self, shape, scheme):
        from qasr.ops.pallas.qconv_ft import (
            pack_to_stacked,
            qconv2d_ft8_stacked,
            qconv2d_ft_stacked,
            stacked_to_pack,
        )

        b, t, f, cin, cout = shape
        kx, kw = jax.random.split(jax.random.PRNGKey(sum(shape)))
        x = _rand(kx, (b, t, f, 4 * cin))
        w = _rand(kw, (4, 3, 3, cin, cout))
        fn = qconv2d_ft_stacked if scheme == "ft10" else qconv2d_ft8_stacked
        x_st = pack_to_stacked(jnp.swapaxes(x, 1, 2))
        got = jnp.swapaxes(stacked_to_pack(fn(x_st, w)), 1, 2)
        want = qconv(x, w, padding="SAME")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_5x5_kernel(self):
        from qasr.ops.pallas.qconv_ft import qconv2d_ft

        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = _rand(kx, (1, 18, 11, 4 * 4))
        w = _rand(kw, (4, 5, 5, 4, 4))
        x_ft = jnp.swapaxes(x, 1, 2)
        got = jnp.swapaxes(qconv2d_ft(x_ft, w), 1, 2)
        want = qconv(x, w, padding="SAME")
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("scheme", ["ft10", "ft8"])
    def test_grads_match(self, scheme):
        from qasr.ops.pallas.qconv_ft import (
            pack_to_stacked,
            qconv2d_ft8_stacked,
            qconv2d_ft_stacked,
            stacked_to_pack,
        )

        kx, kw = jax.random.split(jax.random.PRNGKey(1))
        x = _rand(kx, (1, 18, 7, 4 * 4))
        w = _rand(kw, (4, 3, 3, 4, 4))
        fn = qconv2d_ft_stacked if scheme == "ft10" else qconv2d_ft8_stacked
        x_st = pack_to_stacked(jnp.swapaxes(x, 1, 2))
        g1x, g1w = jax.grad(
            lambda x_, w_: jnp.sum(fn(x_, w_) ** 2), argnums=(0, 1)
        )(x_st, w)
        g2x, g2w = jax.grad(
            lambda x_, w_: jnp.sum(
                qconv(jnp.swapaxes(stacked_to_pack(x_), 1, 2), w_) ** 2
            ),
            argnums=(0, 1),
        )(x_st, w)
        np.testing.assert_allclose(g1w, g2w, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(g1x, g2x, rtol=1e-3, atol=1e-3)

    def test_supported_gate(self):
        from qasr.ops.pallas import qconv_ft

        assert qconv_ft.supported(128, 256, (3, 3), "SAME", None)
        assert not qconv_ft.supported(128, 256, (3, 3), "VALID", None)
        assert not qconv_ft.supported(96, 256, (3, 3), "SAME", None)
        assert not qconv_ft.supported(128, 256, (2, 3), "SAME", None)
        assert not qconv_ft.supported(128, 256, (3, 3), "SAME", (2, 1))


class TestEvenKernelVjpGate:
    def test_even_kernel_grads_fall_back_to_autodiff(self):
        """The rotated-role custom-VJP dx is only valid for odd kernels
        (symmetric SAME padding); even kernels must route to autodiff of the
        plain formulation — dx would otherwise be computed with mirrored
        padding offsets."""
        from qasr.ops.pallas.qconv_ft import (
            pack_to_stacked,
            qconv_fast8_stacked,
            stacked_to_pack,
        )

        kx, kw = jax.random.split(jax.random.PRNGKey(4))
        x = _rand(kx, (1, 12, 6, 4 * 3))
        w = _rand(kw, (4, 2, 2, 3, 3)) * 0.3
        x_st = pack_to_stacked(jnp.swapaxes(x, 1, 2))
        gx, gw = jax.grad(
            lambda a, b: jnp.sum(qconv_fast8_stacked(a, b) ** 2), argnums=(0, 1)
        )(x_st, w)
        gxr, gwr = jax.grad(
            lambda a, b: jnp.sum(
                qconv(jnp.swapaxes(stacked_to_pack(a), 1, 2), b) ** 2
            ),
            argnums=(0, 1),
        )(x_st, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gwr), rtol=1e-3, atol=1e-3)


class TestQGemm8:
    """Rank-8 GEMM with in-VMEM combo formation (qasr/ops/pallas/qgemm8.py):
    parity vs the block qdense across tile-branch shapes (small-K / large-K
    pick different tilings and different dW formulations), padding paths,
    and both grads."""

    @pytest.mark.parametrize(
        "m,k,n",
        [
            (12, 128, 128),    # single tile, small-K branch
            (300, 1664, 256),  # large-K branch, M/K/N all padded
            (7, 256, 62),      # unaligned N (output head width)
            (64, 640, 384),    # K pad rounds past a tile boundary
        ],
    )
    def test_forward_parity(self, m, k, n, interpret_mode):
        from qasr.ops.pallas.qgemm8 import qdense_pallas8
        from qasr.ops.qlinalg import qdense

        rng = np.random.RandomState(m + k + n)
        x = jnp.asarray(rng.randn(m, 4 * k).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.randn(4, k, n).astype(np.float32) * 0.05)
        y = qdense_pallas8(x, w)
        y_ref = qdense(x, w)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("k,n", [(128, 128), (1664, 640)])
    def test_grads_parity(self, k, n, interpret_mode):
        # second case crosses both the large-K tile branch and the rank-8
        # dW formulation branch (k*n >= 1M)
        from qasr.ops.pallas.qgemm8 import qdense_pallas8
        from qasr.ops.qlinalg import qdense

        rng = np.random.RandomState(k)
        x = jnp.asarray(rng.randn(5, 4 * k).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.randn(4, k, n).astype(np.float32) * 0.05)

        def loss(fn):
            return lambda x_, w_: jnp.sum(fn(x_, w_) ** 2)

        gx, gw = jax.grad(loss(qdense_pallas8), argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss(qdense), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=3e-5, atol=3e-5)

    def test_batched_lead_dims(self, interpret_mode):
        from qasr.ops.pallas.qgemm8 import qdense_pallas8
        from qasr.ops.qlinalg import qdense

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 9, 4 * 128).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.randn(4, 128, 128).astype(np.float32) * 0.05)
        y = qdense_pallas8(x, w)
        assert y.shape == (2, 9, 4 * 128)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(qdense(x, w)), rtol=2e-5, atol=2e-5
        )

    def test_supported(self):
        from qasr.ops.pallas.qgemm8 import supported

        assert supported(128, 256)
        assert not supported(96, 128)
        assert not supported(128, 62)
        assert supported(128, 128, None)
        assert not supported(128, 128, jnp.float32)
