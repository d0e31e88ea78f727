"""iris_tpu — TPU-native inverse rendering framework.

A ground-up JAX/XLA/Pallas re-architecture of the capability surface of
IRIS (facebookresearch/iris): recovering spatially-varying BRDF, emitter
radiance and per-camera response functions from posed LDR images + mesh,
via differentiable path tracing. See SURVEY.md / DESIGN.md at repo root.
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("IRIS_TPU_NO_CACHE"):
    # Persistent XLA compilation cache: first-jit of the big integrators
    # costs minutes over this environment's remote-compile tunnel; caching
    # makes every process after the first start instantly.
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "IRIS_TPU_CACHE_DIR",
            _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

if _os.environ.get("IRIS_TPU_FORCE_CPU"):
    # JAX_PLATFORMS is ignored by this environment's TPU plugin; this knob
    # pins the default device to CPU (same mechanism as tests/conftest.py).
    try:
        import jax as _jax2

        _jax2.config.update("jax_default_device", _jax2.devices("cpu")[0])
    except Exception:
        pass

from iris_tpu.const import GAMMA, SEED, RAY_EPS
