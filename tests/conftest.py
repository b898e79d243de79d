"""Test harness config: force an 8-device CPU mesh (SURVEY.md §4 test 6).

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env mutation here is too late; jax.config.update still
works because no backend has been initialized yet. Distributed (DP/TP/
shard_map) logic is unit-tested on 8 fake CPU devices; real-TPU lowering is
exercised by bench.py and the driver's graft entry.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
