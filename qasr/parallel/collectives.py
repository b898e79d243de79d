"""Collective helpers: cross-host metric aggregation and in-graph reductions.

The reference has no communication layer (SURVEY.md §2c P6); here the
NCCL-equivalents are XLA collectives. In-graph reductions are GSPMD-inserted
(psum over "data" for gradients); this module adds the host-level helpers the
decode/eval path needs: PER numerator/denominator aggregation across DP
shards of the eval set (SURVEY.md §3.4 "multi-host DP beam decode").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def allsum_across_hosts(values: np.ndarray) -> np.ndarray:
    """Sum an array of host-local counters across all processes.

    Single-process: identity. Multi-host: allgather over DCN then sum, so
    every host gets the global PER numerator/denominator.
    """
    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(values))
    return np.asarray(gathered).sum(axis=0)


def aggregate_per(errs: int, total: int) -> tuple[int, int]:
    out = allsum_across_hosts(np.array([errs, total], np.int64))
    return int(out[0]), int(out[1])
