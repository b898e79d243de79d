"""Quaternion-aware weight initialization — the paper's exact recipe.

Capability parity: the reference preserves the quaternion Glorot/He criterion
exactly (SURVEY.md §2a C3, provenance [PAPER §3.3][BASELINE] — "quaternion-aware
weight init preserved exactly"; mount empty, no file:line available):

  sigma  = 1/sqrt(2*(fan_in+fan_out))   (glorot)   or   1/sqrt(2*fan_in)   (he)
  |w|   ~ Chi(4 dof) at scale sigma     (norm of a 4-D N(0, sigma^2 I) draw)
  u      = random unit pure-imaginary quaternion (uniform on S^2)
  theta ~ U(-pi, pi)
  w      = |w| (cos theta + u sin theta)
        => (w_r, w_i, w_j, w_k)
         = (|w| cos th, |w| u_x sin th, |w| u_y sin th, |w| u_z sin th)

fan_in/fan_out are counted in *quaternion* units (Cin*prod(kernel),
Cout*prod(kernel)) — the criterion normalizes the variance of the full
quaternion weight Var(W) = 4 sigma^2, per the paper.

Golden values for a fixed PRNG key are locked in tests/test_init.py so the
recipe can never drift silently (SURVEY.md §4 test 3).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape_per_component: tuple[int, ...]) -> tuple[int, int]:
    """Quaternion fan_in/fan_out for a ``[*kernel, Cin, Cout]`` component shape."""
    if len(shape_per_component) < 2:
        raise ValueError(f"need at least [Cin, Cout], got {shape_per_component}")
    receptive = int(np.prod(shape_per_component[:-2])) if len(shape_per_component) > 2 else 1
    cin, cout = shape_per_component[-2], shape_per_component[-1]
    return cin * receptive, cout * receptive


def quaternion_init(
    key: jax.Array,
    shape: tuple[int, ...],
    dtype=jnp.float32,
    *,
    criterion: str = "glorot",
):
    """Initialize stacked quaternion weights ``[4, *kernel, Cin, Cout]``.

    Flax-compatible signature: pass ``criterion`` via functools.partial or use
    :func:`quaternion_initializer`.
    """
    if shape[0] != 4:
        raise ValueError(f"stacked quaternion shape must lead with 4, got {shape}")
    per_comp = tuple(shape[1:])
    fan_in, fan_out = _fans(per_comp)
    if criterion == "glorot":
        sigma = 1.0 / math.sqrt(2.0 * (fan_in + fan_out))
    elif criterion == "he":
        sigma = 1.0 / math.sqrt(2.0 * fan_in)
    else:
        raise ValueError(f"unknown criterion {criterion!r}")

    k_mag, k_axis, k_phase = jax.random.split(key, 3)
    # |w| ~ Chi(4, scale=sigma): norm of a 4-D isotropic Gaussian draw.
    mag = sigma * jnp.linalg.norm(
        jax.random.normal(k_mag, (*per_comp, 4), dtype=jnp.float32), axis=-1
    )
    # Random unit pure-imaginary axis: uniform on the 2-sphere.
    axis = jax.random.normal(k_axis, (*per_comp, 3), dtype=jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    theta = jax.random.uniform(
        k_phase, per_comp, minval=-math.pi, maxval=math.pi, dtype=jnp.float32
    )

    w_r = mag * jnp.cos(theta)
    sin_t = mag * jnp.sin(theta)
    w = jnp.stack(
        [w_r, sin_t * axis[..., 0], sin_t * axis[..., 1], sin_t * axis[..., 2]],
        axis=0,
    )
    return w.astype(dtype)


def quaternion_initializer(criterion: str = "glorot"):
    """Returns a flax/jax.nn-style initializer ``(key, shape, dtype) -> array``."""
    def init(key, shape, dtype=jnp.float32):
        return quaternion_init(key, tuple(shape), dtype, criterion=criterion)
    return init
