"""Global constants.

Parity: reference const.py (GAMMA=2.2, SEED=0). RAY_EPS plays the role of
mitsuba.math.RayEpsilon used for shadow/self-intersection offsets
(reference utils/path_tracing.py:97).
"""

GAMMA = 2.2
SEED = 0

# mitsuba's RayEpsilon = eps * 1500 with eps = 2^-23  ->  ~1.788e-4.
RAY_EPS = 1.788139e-4
