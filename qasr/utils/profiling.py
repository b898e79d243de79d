"""Tracing / profiling / roofline utilities (SURVEY.md §5).

The reference has no profiling beyond the Keras progress bar; here:

* `trace(...)` wraps `jax.profiler.trace` for TensorBoard/Perfetto dumps;
* `steady_state_time(...)` is the robust wall-clock harness (difference
  quotient of two chained run lengths — cancels the axon tunnel's ~30 ms
  fetch RTT and queue-fill transient; see bench.py for why each unit must be
  one jit-compiled scan ending in a host fetch: `block_until_ready` does not
  truly synchronize on this backend);
* `conv_roofline(...)` reports the quaternion-conv achieved FLOPs against
  chip peak and against the 4x-expanded real conv — the BASELINE.json
  "% of roofline" metric.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    peak_bf16_tflops: float
    hbm_gbps: float


# Public specs; the axon pool reports v5e.
CHIPS = {
    "v5e": ChipSpec("v5e", 197.0, 819.0),
    "v5p": ChipSpec("v5p", 459.0, 2765.0),
    "v6e": ChipSpec("v6e", 918.0, 1640.0),
}


# Backends whose PJRT plugin does not implement the profiler session; starting
# a trace there hangs the process (observed on the tunneled axon plugin —
# docs/end_to_end.md).
_TRACE_UNSUPPORTED = ("axon",)


def trace_supported() -> bool:
    import jax

    return jax.default_backend() not in _TRACE_UNSUPPORTED


@contextlib.contextmanager
def trace(log_dir: str, *, force: bool = False):
    """Profile a region into `log_dir` (TensorBoard / xprof format).

    On backends without profiler support (see `trace_supported`) this is a
    warning no-op instead of a hang; `force=True` overrides the guard.
    """
    import jax

    if not force and not trace_supported():
        import warnings

        warnings.warn(
            f"jax.profiler traces hang on backend {jax.default_backend()!r}; "
            "trace() is a no-op here (force=True to override)",
            stacklevel=3,
        )
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def steady_state_times(runs: dict, *, n_small=5, n_big=25, repeats=3) -> dict:
    """Interleaved difference-quotient seconds/step for several arms.

    ``runs`` maps name -> run_chained(n) -> wall seconds, or name ->
    (run_chained, (n_small, n_big)) for per-arm chain lengths. Arms are
    interleaved ABAB across repeats (shed tunnel/pool drift) and per-arm
    medians are returned. This is the project's one timing harness —
    bench.py and the benchmarks/ probes all route through it.
    """
    import statistics

    norm = {
        k: (v if isinstance(v, tuple) else (v, (n_small, n_big)))
        for k, v in runs.items()
    }
    est = {k: [] for k in runs}
    for _ in range(repeats):
        for name, (run, (ns, nb)) in norm.items():
            t_small = run(ns)
            t_big = run(nb)
            est[name].append((t_big - t_small) / (nb - ns))
    return {k: statistics.median(v) for k, v in est.items()}


def steady_state_time(run_chained, *, n_small=5, n_big=25, repeats=3) -> float:
    """Difference-quotient seconds/step for `run_chained(n) -> wall seconds`."""
    return steady_state_times(
        {"arm": run_chained}, n_small=n_small, n_big=n_big, repeats=repeats
    )["arm"]


def qconv_flops(batch, t, f, cin, cout, kh=3, kw=3) -> int:
    """MXU FLOPs of one quaternion conv fwd at SAME padding (16 block
    products == the 4x-expanded real conv's FLOPs; the reference's strategy,
    SURVEY.md §3.2)."""
    return 2 * batch * t * f * kh * kw * (4 * cin) * (4 * cout)


def conv_roofline(
    *,
    batch=16,
    t=256,
    f=13,
    cin=64,
    cout=64,
    dtype="bfloat16",
    chip="v5e",
    use_pallas=False,
    variant="block",
    repeats=3,
) -> dict:
    """Measure achieved quaternion-conv FLOPs vs chip peak.

    Returns a dict with achieved TFLOP/s, % of peak, and seconds/step for the
    quaternion path and the explicitly 4x-expanded real conv baseline.
    `variant` picks the Hamilton path (block | fast | fast10); FLOPs are
    always counted as the 16-product equivalent (the reference's per-step
    computation), so the 10-product path can legitimately exceed 100 % of
    the *expanded-conv* roofline — that is the algorithmic win.
    """
    import jax
    import jax.numpy as jnp

    from qasr.ops.qlinalg import qconv, qconv_fast, qconv_fast10
    from qasr.ops.pallas import qconv2d_pallas
    from qasr.ops.quaternion import hamilton_expand

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    kx, kw_ = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (batch, t, f, 4 * cin), dt)
    w = jax.random.normal(kw_, (4, 3, 3, cin, cout), dt)
    w_big = hamilton_expand(w)

    paths = {"block": qconv, "fast": qconv_fast, "fast10": qconv_fast10}
    q_fn = jax.jit(qconv2d_pallas if use_pallas else paths[variant])

    @jax.jit
    def real_fn(x, w_big):
        from jax import lax

        dn = lax.conv_dimension_numbers(
            x.shape, w_big.shape, ("NHWC", "HWIO", "NHWC")
        )
        return lax.conv_general_dilated(x, w_big, (1, 1), "SAME", dimension_numbers=dn)

    import functools

    def make_chain(fn, *args):
        # ONE jit-compiled scan of n chained convs ending in a scalar the
        # host fetches (the only true sync on this backend); RMS-normalize
        # between convs so bf16 values stay finite along the chain.
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x, n, *rest):
            def body(c, _):
                y = fn(c, *rest)
                scale = jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                ).astype(y.dtype)
                return y * scale, ()

            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))

        def run(n):
            float(chain(args[0], n, *args[1:]))  # warm/compile
            t0 = time.perf_counter()
            v = float(chain(args[0], n, *args[1:]))
            dt_run = time.perf_counter() - t0
            assert v == v, "non-finite chain output"
            return dt_run

        return run

    # chainable only if shapes match (SAME padding, cin == cout)
    assert cin == cout, "roofline harness chains outputs; needs cin == cout"
    t_q = steady_state_time(
        make_chain(lambda c, ww: q_fn(c, ww), x, w),
        n_small=10, n_big=60, repeats=repeats,
    )
    t_r = steady_state_time(
        make_chain(lambda c, ww: real_fn(c, ww), x, w_big.astype(dt)),
        n_small=10, n_big=60, repeats=repeats,
    )

    flops = qconv_flops(batch, t, f, cin, cout)
    spec = CHIPS[chip]
    achieved_q = flops / t_q / 1e12
    achieved_r = flops / t_r / 1e12
    return {
        "flops_per_step": flops,
        "qconv_s": t_q,
        "expanded_real_s": t_r,
        "qconv_tflops": achieved_q,
        "expanded_real_tflops": achieved_r,
        "qconv_pct_of_peak": 100 * achieved_q / spec.peak_bf16_tflops,
        "qconv_vs_expanded_real": t_r / t_q,
        "variant": "pallas" if use_pallas else variant,
        "chip": chip,
    }
