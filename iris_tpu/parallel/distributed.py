"""Multi-host initialization + cross-host array assembly.

On a multi-host TPU slice, call `ensure_multihost()` once at program start
(stage CLIs call it when IRIS_TPU_MULTIHOST=1): it wires
jax.distributed.initialize from the standard TPU environment variables so
every host sees the global device set; the data-parallel mesh in
sharding.py then spans hosts automatically and GSPMD routes the gradient
psum over ICI/DCN.

Host-side input sharding uses sharding.host_shard_indices /
RayBatcher(process_index, process_count); `global_batch` /
`global_replicate` assemble the per-process chunks into global arrays for
the jitted SPMD step.

Failure policy: when multihost is explicitly requested
(IRIS_TPU_MULTIHOST=1 or a coordinator address is given), any failure to
reach the expected process count is a HARD ERROR — a silent fallback to
single-host would train on 1/Nth of the data while reporting success.
Functional coverage: tests/test_multiprocess.py runs a real 2-process CPU
jax.distributed cluster through this module.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = False


def ensure_multihost(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     timeout_s: int | None = None) -> bool:
    """Initialize jax.distributed when multihost is requested.

    Safe to call multiple times (no-op after the first) and on a plain
    single-host run with IRIS_TPU_MULTIHOST unset (returns False without
    touching jax.distributed). Returns True iff distributed mode is active.

    Raises RuntimeError when multihost was requested but could not be
    established (dead coordinator, wrong process count): degrading to a
    silent single-host run would drop (N-1)/N of the data.
    """
    global _INITIALIZED
    want = os.environ.get("IRIS_TPU_MULTIHOST") == "1" or coordinator
    if _INITIALIZED:
        # Re-validate on every call: the hard-fail policy must not be
        # one-shot (a driver that swallowed the first error, or a second
        # stage CLI in the same process, would otherwise get a silent
        # success with the wrong process count).
        if want:
            _validate_process_count(num_processes)
        return jax.process_count() > 1
    if not want:
        return False
    if timeout_s is None:
        timeout_s = int(os.environ.get("IRIS_TPU_MULTIHOST_TIMEOUT", "300"))
    # name the actual trigger in errors: the env var OR the coordinator arg
    how = ("IRIS_TPU_MULTIHOST=1"
           if os.environ.get("IRIS_TPU_MULTIHOST") == "1"
           else f"coordinator={coordinator!r}")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            pass  # benign re-entry (e.g. two stage CLIs in one process)
        else:
            raise RuntimeError(
                f"multihost requested ({how}) but "
                f"jax.distributed.initialize failed: {e}") from e
    except Exception as e:
        raise RuntimeError(
            f"multihost requested ({how}) but "
            f"jax.distributed.initialize failed: {e}") from e
    _validate_process_count(num_processes)
    _INITIALIZED = True
    return jax.process_count() > 1


def _validate_process_count(num_processes: int | None) -> None:
    """Hard-fail when the joined cluster is smaller than requested —
    runs after initialize AND on every re-entry (never one-shot)."""
    expected = num_processes if num_processes is not None else int(
        os.environ.get("IRIS_TPU_NUM_PROCESSES", "0"))
    got = jax.process_count()
    if expected and got != expected:
        raise RuntimeError(
            f"multihost requested with {expected} processes but "
            f"jax.process_count()={got}; refusing to run single-host "
            "silently (would train on 1/N of the data)")
    if not expected and got == 1:
        raise RuntimeError(
            "multihost requested but jax.process_count()==1 after "
            "initialize; set IRIS_TPU_NUM_PROCESSES or pass num_processes, "
            "or drop the multihost request (IRIS_TPU_MULTIHOST / "
            "coordinator) for a single-host run")


def host_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")


def global_replicate(mesh, tree):
    """Replicate a host-local pytree onto a (possibly multi-process) mesh.

    Unlike sharding.replicate (device_put, single-controller only), this
    assembles jax.Arrays via make_array_from_callback so it works when the
    mesh spans devices this process cannot address. Every process must pass
    the same values (params/opt-state initialized from the same seed).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P())

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(one, tree)


def global_batch(mesh, tree):
    """Assemble per-process batch chunks into global axis-0-sharded arrays.

    Each process passes ONLY its local chunk (shape [B/process_count, ...]);
    the result is a global array of shape [B, ...] sharded over the mesh's
    'data' axis. This is the multi-host input path that replaces the
    reference's single-GPU dataloader (utils/dataset/synthetic_ldr.py:388).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("data"))

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(s, x)

    return jax.tree_util.tree_map(one, tree)
