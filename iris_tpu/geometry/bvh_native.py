"""ctypes bindings for the native C++ binned-SAH BVH builder (csrc/).

Compiled on first use into csrc/build/libbvh.so (g++ -O3); falls back to
None when no toolchain is available, in which case build_bvh uses the
vectorized Morton builder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _compile() -> str | None:
    src = os.path.abspath(os.path.join(_CSRC, "bvh_builder.cpp"))
    if not os.path.exists(src):
        return None
    build_dir = os.path.join(os.path.dirname(src), "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libbvh.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _compile()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # stale/foreign prebuilt binary (checkout gives .so and .cpp
            # equal mtimes): force a rebuild once, then give up gracefully
            try:
                os.remove(so)
            except OSError:
                return None
            so = _compile()
            if so is None:
                return None
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                return None
        lib.build_bvh_sah.restype = ctypes.c_int
        lib.build_bvh_sah.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
        return _LIB


def build_sah_arrays(triangles: np.ndarray, leaf_size: int = 4,
                     spatial_alpha: float | None = None):
    """Returns (nodes (N,8), tris (P,12)) float32 or None if unavailable.

    spatial_alpha: SBVH spatial-split admission threshold (fraction of
    root surface area, Stich et al. 2009) — the tree-quality class the
    reference gets from Mitsuba's OptiX BVH (/root/reference/utils/
    path_tracing.py:17-48). Negative disables them (pure binned object
    SAH). Default OFF: on this framework's TILE-UNION traversal the
    duplicated references inflate the per-tile visited set (measured
    host-sim, probes/sbvh_tile_sim*.py: 2x camera-tile iterations, +33%
    bounce at alpha=1e-3 on the 102K-face clutter scene — spatial splits
    help per-ray walks, not lockstep tile walks). Env override:
    IRIS_TPU_BVH_ALPHA for scenes with large straddling triangles.
    """
    lib = get_lib()
    if lib is None:
        return None
    if spatial_alpha is None:
        spatial_alpha = float(os.environ.get("IRIS_TPU_BVH_ALPHA", "-1"))
    tris = np.ascontiguousarray(triangles, np.float32)
    f = tris.shape[0]
    # spatial splits duplicate references (capped at 1.8x in the builder);
    # leaves pad to a leaf_size multiple, one padded leaf per ~1 ref worst
    # case, hence the *leaf_size headroom on rows and 2x refs on nodes
    ref_cap = 2 * f + 16
    nodes_cap = max(2 * ref_cap + 2, 16)
    tris_cap = (ref_cap + 1) * leaf_size
    nodes = np.empty((nodes_cap, 8), np.float32)
    out_tris = np.empty((tris_cap, 12), np.float32)
    n_nodes = ctypes.c_int64(0)
    n_rows = ctypes.c_int64(0)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.build_bvh_sah(
        tris.ctypes.data_as(fp), ctypes.c_int64(f), ctypes.c_int(leaf_size),
        ctypes.c_float(spatial_alpha),
        nodes.ctypes.data_as(fp), ctypes.c_int64(nodes_cap),
        out_tris.ctypes.data_as(fp), ctypes.c_int64(tris_cap),
        ctypes.byref(n_nodes), ctypes.byref(n_rows),
    )
    if rc != 0:
        return None
    return (nodes[: n_nodes.value].copy(), out_tris[: n_rows.value].copy())
