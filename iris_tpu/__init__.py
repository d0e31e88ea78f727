"""iris_tpu — TPU-native inverse rendering framework.

A ground-up JAX/XLA/Pallas re-architecture of the capability surface of
IRIS (facebookresearch/iris): recovering spatially-varying BRDF, emitter
radiance and per-camera response functions from posed LDR images + mesh,
via differentiable path tracing. See SURVEY.md / DESIGN.md at repo root.
"""

__version__ = "0.1.0"

from iris_tpu.const import GAMMA, SEED, RAY_EPS
