"""Sanitizer / profiling-tier tests (SURVEY.md §5 "Race detection /
sanitizers"): the debug hooks must actually catch injected numerics faults
inside jit, and the trace guard must not hang on profiler-less backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr.utils import debug, profiling


def test_nan_debug_catches_injected_nan():
    @jax.jit
    def f(x):
        return jnp.log(x)  # log(-1) -> NaN

    with debug.nan_debug():
        with pytest.raises(FloatingPointError):
            np.asarray(f(jnp.float32(-1.0)))
    # config restored: NaNs pass silently again outside the context
    assert np.isnan(np.asarray(f(jnp.float32(-1.0))))


def test_checkify_fn_surfaces_nan_as_error():
    def f(x):
        return jnp.sqrt(x) + 1.0

    checked = jax.jit(debug.checkify_fn(f))
    err, out = checked(jnp.float32(-4.0))
    with pytest.raises(Exception, match="nan"):
        err.throw()
    err_ok, out_ok = checked(jnp.float32(4.0))
    err_ok.throw()  # no error
    assert float(out_ok) == pytest.approx(3.0)


def test_checkify_fn_surfaces_oob_index():
    def f(x, i):
        return x[i]

    checked = jax.jit(debug.checkify_fn(f))
    err, _ = checked(jnp.arange(4.0), jnp.int32(7))
    with pytest.raises(Exception):
        err.throw()


def test_trace_noop_on_unsupported_backend(monkeypatch, tmp_path):
    # pretend the current backend (cpu here) lacks profiler support: trace()
    # must warn and no-op instead of starting a session (which hangs on axon)
    monkeypatch.setattr(
        profiling, "_TRACE_UNSUPPORTED", (jax.default_backend(),)
    )
    assert not profiling.trace_supported()
    with pytest.warns(UserWarning, match="no-op"):
        with profiling.trace(str(tmp_path)):
            jnp.ones(()) + 1


def test_trace_supported_on_cpu():
    assert profiling.trace_supported()  # tests run on the cpu backend


def test_deterministic_mode_sets_partitionable():
    debug.deterministic_mode()
    assert jax.config.jax_threefry_partitionable
