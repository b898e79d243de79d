"""Sequence-parallel quaternion convolution — halo exchange over the mesh.

SURVEY.md §2c P3: for very long utterances the time axis is sharded across
devices; a 2-D conv with a (kh, kw) kernel then needs only the (kh-1)/2
boundary frames from each neighbor. This module implements that with
`shard_map` + `lax.ppermute`: each shard exchanges halo frames with its ring
neighbors over ICI, masks the global sequence boundaries to the zero-padding
SAME convolution expects, and runs the ordinary quaternion conv on its local
chunk. Time stride must be 1 (the CTC topology's invariant in this framework).

The reference has no sequence parallelism of any kind (single device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from qasr.ops.qlinalg import qconv


def qconv2d_seq_parallel(
    x: jnp.ndarray,
    w: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "data",
) -> jnp.ndarray:
    """Quaternion conv2d with the time axis sharded over `axis`.

    x: ``[B, T, F, 4*Cin]`` (T divisible by the axis size); w: ``[4, kh, kw,
    Cin, Cout]``; SAME padding, stride 1. Returns ``[B, T, F, 4*Cout]`` with
    the same sharding.
    """
    kh = w.shape[1]
    if kh % 2 == 0:
        raise ValueError("sequence-parallel conv requires an odd time kernel")
    hh = (kh - 1) // 2
    n = mesh.shape[axis]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
    )
    def _fn(x_local, w_full):
        # x_local: [B, T/n, F, 4Cin]
        idx = lax.axis_index(axis)
        if hh > 0 and n > 1:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            # halo from the LEFT neighbor (its trailing frames travel +1)
            left = lax.ppermute(x_local[:, -hh:], axis, perm=fwd)
            # halo from the RIGHT neighbor (its leading frames travel -1)
            right = lax.ppermute(x_local[:, :hh], axis, perm=bwd)
            # global boundaries see zeros (SAME zero padding semantics)
            left = jnp.where(idx == 0, jnp.zeros_like(left), left)
            right = jnp.where(idx == n - 1, jnp.zeros_like(right), right)
            x_ext = jnp.concatenate([left, x_local, right], axis=1)
        else:
            x_ext = jnp.pad(x_local, ((0, 0), (hh, hh), (0, 0), (0, 0)))
        # VALID in time over the halo-extended chunk == SAME on the global T;
        # SAME in frequency.
        pw = (w_full.shape[2] - 1) // 2
        pw2 = w_full.shape[2] - 1 - pw
        y = qconv(
            x_ext,
            w_full,
            padding=((0, 0), (pw, pw2)),
        )
        return y

    return _fn(x, w)
