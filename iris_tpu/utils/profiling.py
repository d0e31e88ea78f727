"""Device-trace capture helpers (SURVEY.md §5 tracing/profiling).

The reference's only profiling surface is per-stage wall-clock prints
(train_brdf_crf.py:559-566). Here the per-component numbers come from
bench_components.py / utils/timing.bench_scan; this module adds proper
XLA device traces for kernel-level attribution (the round-5 encode-bwd
investigation, TODO.md):

    from iris_tpu.utils.profiling import device_trace
    with device_trace("outputs/trace_encode"):
        jax.block_until_ready(step(key))

Traces open in Perfetto (ui.perfetto.dev) / TensorBoard. On the tunneled
axon backend the TPU-side trace may be unavailable — capture degrades to
host+XLA events; wrap in `available()` to guard.
"""

from __future__ import annotations

import contextlib
import os


def available() -> bool:
    try:
        import jax.profiler  # noqa: F401
        return True
    except Exception:
        return False


@contextlib.contextmanager
def device_trace(logdir: str, host_tracer_level: int = 2):
    """Capture a profiler trace into `logdir` (created if needed).

    Always yields; capture failures degrade to a no-op with a warning so
    probes stay runnable on backends without profiling support."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # backend without trace support
        print(f"[profiling] trace unavailable ({type(e).__name__}: {e}); "
              "running unprofiled")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[profiling] trace written to {logdir}")
            except Exception as e:
                print(f"[profiling] stop_trace failed: {e}")
