#!/usr/bin/env python
"""Is row-contracting (lhs-transposed) dot_general native-speed in Mosaic?

Times acc += x^T @ y (contraction over rows — the shape a Pallas dW kernel
needs) against the identical data pre-transposed for a plain matmul.
Result (v5e, 2026-08-20): 36 TF vs 63 TF — Mosaic inserts relayouts for the
transposed orientation, which is why qasr delegates dW to XLA's correlation
convs (94% of scheme speed-of-light) instead of a Pallas dW kernel
(docs/performance.md).
"""
import functools, json, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from qasr.utils.profiling import steady_state_times

M, K, N, G = 65536, 256, 256, 128  # G chunks of rows

def make(mode):
    def kern(x_ref, y_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[:]
        y = y_ref[:]  # [M/G, N]
        if mode == "dgt":
            # x: [M/G, K], contract rows with rows
            p = lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [K, N]
        else:
            # x delivered pre-transposed [K, M/G]: plain matmul reference
            p = lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[:] += p
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    x_spec = (pl.BlockSpec((M // G, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
              if mode == "dgt"
              else pl.BlockSpec((K, M // G), lambda i: (0, i), memory_space=pltpu.VMEM))

    @jax.jit
    def f(x, y):
        return pl.pallas_call(
            kern, grid=(G,),
            in_specs=[x_spec,
                      pl.BlockSpec((M // G, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((K, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(x, y)
    return f

kx, ky = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(kx, (M, K), jnp.bfloat16)
y = jax.random.normal(ky, (M, N), jnp.bfloat16)

# correctness of dgt arm
got = make("dgt")(x, y).astype(jnp.float32)
want = (x.astype(jnp.float32).T @ y.astype(jnp.float32))
import numpy as np
print("dgt err:", float(jnp.max(jnp.abs(got - want))), "scale", float(jnp.std(want)))

xT = jnp.asarray(x.T)
def chain_of2(f, xx):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, y, n):
        def body(c, _):
            o = f(x * (1 + c * 1e-20).astype(x.dtype), y)
            return c + jnp.sum(o[:1, :1].astype(jnp.float32)) * 1e-20, ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return c
    def run(n):
        float(chain(xx, y, n)); t0 = time.perf_counter(); float(chain(xx, y, n))
        return time.perf_counter() - t0
    return run
t = steady_state_times({"dgt": chain_of2(make("dgt"), x), "plain": chain_of2(make("plain"), xT)},
                       n_small=5, n_big=30, repeats=3)
flops = 2 * M * K * N
print(json.dumps({k: {"us": round(v*1e6,1), "tflops": round(flops/v/1e12,1)} for k, v in t.items()}))
