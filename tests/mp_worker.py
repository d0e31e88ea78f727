"""Worker process for the 2-process jax.distributed functional test.

Run standalone (never imported by pytest). Modes:
  dist <pid> <nproc> <port>  — join a localhost CPU cluster, assert the
      global device view, print host-strided batch indices, run ONE real
      GSPMD train step over the global mesh and print loss + update
      checksum. tests/test_multiprocess.py compares the two processes'
      outputs against each other and against `single` mode.
  single                     — same step on an 8-virtual-device
      single-process mesh (the equivalence oracle).
  deadcoord                  — point at a dead coordinator with
      IRIS_TPU_MULTIHOST=1 and assert ensure_multihost HARD-FAILS
      (VERDICT round-2 weak #6: no silent single-host degradation).

This exercises the one multi-chip surface the virtual mesh cannot:
a real multi-controller jax.distributed cluster (SURVEY.md §2.6;
reference has no equivalent — it is single-GPU, utils/path_tracing.py
chunks instead of sharding).
"""

import json
import os
import sys


def main():
    mode = sys.argv[1]
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from iris_tpu.parallel.distributed import (
        ensure_multihost, global_batch, global_replicate, host_summary,
    )

    if mode == "deadcoord":
        os.environ["IRIS_TPU_MULTIHOST"] = "1"
        try:
            ensure_multihost(coordinator="localhost:1", num_processes=2,
                             process_id=1, timeout_s=5)
        except RuntimeError as e:
            print("RAISED", str(e)[:80])
            return
        print("NO_RAISE")
        sys.exit(1)

    if mode == "dist":
        pid, nproc, port = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        os.environ["IRIS_TPU_MULTIHOST"] = "1"
        active = ensure_multihost(coordinator=f"localhost:{port}",
                                  num_processes=nproc, process_id=pid,
                                  timeout_s=120)
        assert active, "distributed mode not active"
        assert jax.process_count() == nproc, jax.process_count()
        assert jax.device_count() == 8, jax.device_count()
        assert jax.local_device_count() == 8 // nproc
        print("SUMMARY", host_summary())

    from iris_tpu.demo import make_demo_batch, make_demo_scene
    from iris_tpu.parallel.sharding import (
        host_shard_indices, replicate, shard_batch,
    )
    from iris_tpu.train.loop import make_train_step
    from iris_tpu.train.optim import make_optimizer
    from iris_tpu.train.steps import LossConfig, make_initialize_loss

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    # host-strided input indices must be disjoint across processes
    idx = np.asarray(host_shard_indices(64, 32, jax.random.PRNGKey(7), 3))
    print("IDX", json.dumps(np.sort(idx).tolist()))

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=2, slf_res=8, hash_levels=4, log2_table=8)
    cfg = LossConfig(spp=2, max_segments=8)
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    params = {"material": ngp, "radiance": em.radiance}
    opt = make_optimizer(learning_rate=5e-2)
    opt_state = opt.init(params)
    batch = jax.tree_util.tree_map(np.asarray, make_demo_batch(n_side=8))

    if mode == "dist":
        pc, pi = jax.process_count(), jax.process_index()
        local = {k: v[pi * (v.shape[0] // pc):(pi + 1) * (v.shape[0] // pc)]
                 for k, v in batch.items()}
        gb = global_batch(mesh, local)
        gp = global_replicate(mesh, params)
        go = global_replicate(mesh, opt_state)
    else:
        gp = replicate(mesh, params)
        go = replicate(mesh, opt_state)
        gb = {k: shard_batch(mesh, v) for k, v in batch.items()}

    step = make_train_step(loss_fn, opt, mesh, donate=False)
    p2, _, loss, _ = step(gp, go, gb, jax.random.PRNGKey(0))
    lv = float(np.asarray(loss.addressable_data(0)))
    delta = p2["material"].table - gp["material"].table
    chk = float(np.abs(np.asarray(delta.addressable_data(0))).sum())
    print(f"LOSS {lv:.8f}")
    print(f"CHK {chk:.6f}")
    sys.stdout.flush()

    if mode == "dist":
        # Orderly teardown: shutdown() runs the coordination-service
        # barrier so neither process FATALs on seeing its peer vanish
        # (the race shows up as "Terminating process ... another task
        # died" AFTER both results printed). It can hang on CPU
        # clusters, so cap it and fall through to os._exit.
        import threading

        t = threading.Thread(target=lambda: jax.distributed.shutdown(),
                             daemon=True)
        t.start()
        t.join(30)


if __name__ == "__main__":
    main()
    # jax.distributed shutdown can hang on CPU clusters; results are
    # already printed (CLAUDE.md interpreter-exit rule)
    sys.stdout.flush()
    os._exit(0)
