from iris_tpu.render.integrator import (
    path_tracing,
    path_tracing_det_diff,
    path_tracing_det_spec,
    path_tracing_single,
    trace_indirect,
)
