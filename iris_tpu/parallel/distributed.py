"""Multi-host initialization + cross-host reductions.

On a multi-host TPU slice, call `ensure_multihost()` once at program start
(stage CLIs call it when IRIS_TPU_MULTIHOST=1): it wires
jax.distributed.initialize from the standard TPU environment variables so
every host sees the global device set; the data-parallel mesh in
sharding.py then spans hosts automatically and GSPMD routes the gradient
psum over ICI/DCN.

Host-side input sharding uses sharding.host_shard_indices /
RayBatcher(process_index, process_count).
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def ensure_multihost(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host. Safe to call
    multiple times / on a single host (no-op). Returns True if distributed
    mode is active."""
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    want = os.environ.get("IRIS_TPU_MULTIHOST") == "1" or coordinator
    if not want:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
    except Exception as e:  # already initialized or single-host
        print(f"[distributed] initialize skipped: {e}")
    return jax.process_count() > 1


def host_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")
