"""Worker process for the REAL 2-process distributed test.

Launched by tests/test_multiprocess.py as two separate Python processes
that form one JAX distributed system over localhost (CPU backend, 4
virtual devices each -> 8 global). Each worker exercises the actual
multi-process code paths the reference exercised with DDP
(utils.py:255-296 init, engine_for_finetuning.py:281-339 merge):

  - core.distributed.init_distributed_mode from torch-style env vars
  - parallel.mesh.shard_params (make_array_from_callback branch)
  - global batches via jax.make_array_from_process_local_data
  - jitted sharded train steps (psum over both processes)
  - MetricLogger.epoch_stats(sync=True) cross-process allreduce
  - eval.multiview.gather_across_processes allgather merge
  - one collective orbax save from ALL processes

Results are dumped as JSON for the parent test to compare against a
single-process 8-device run of the identical computation.
"""

import json
import os
import sys


def main() -> None:
    outdir = sys.argv[1]
    # jax may already be imported at interpreter startup (sitecustomize
    # registers the axon TPU plugin); force CPU before any device query
    # and widen to 4 virtual devices per process.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mofo_tpu.core.distributed import init_distributed_mode

    init_distributed_mode(verbose=False)  # reads RANK/WORLD_SIZE/MASTER_*
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mofo_tpu.parallel import mesh as mesh_lib
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.metrics import MetricLogger
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState
    from mofo_tpu.train.checkpoint import save_checkpoint
    from mofo_tpu.eval.multiview import (
        MultiViewAggregator,
        gather_across_processes,
    )
    from tests.test_train_step import init_state, tiny_cfg, tiny_model

    mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=8))
    cfg = tiny_cfg(batch_size=8)
    model = tiny_model()
    lr = schedules.cosine_schedule(3e-3, 1e-4, 8, 10, 1)
    tx = optim.create_optimizer(
        init_state(model, cfg, __import__("optax").adam(0.0)).params,
        lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05,
    )
    state = init_state(model, cfg, tx, B=4)
    # identical host params on both processes (same PRNG init) ->
    # shard_params takes the make_array_from_callback branch
    state = state.replace(
        params=mesh_lib.shard_params(state.params, mesh)
    )

    batch_sharding = NamedSharding(mesh, P(("data", "fsdp")))
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
    logger = MetricLogger(print_fn=lambda *a, **k: None)

    rng = jax.random.PRNGKey(2)
    for it in range(2):
        # global batch of 8 deterministic clips; this process feeds its
        # local half through make_array_from_process_local_data
        full = np.random.RandomState(100 + it).rand(
            8, cfg.num_frames, cfg.input_size, cfg.input_size, 3
        ).astype(np.float32)
        local = full[pid * 4:(pid + 1) * 4]
        clip = jax.make_array_from_process_local_data(
            batch_sharding, local
        )
        state, metrics = step(state, {"clip": clip}, rng, 0.0)
        logger.update(loss=float(metrics["loss"]))
    stats = logger.epoch_stats(sync=True)

    # eval merge: each process contributes distinct rows
    agg = MultiViewAggregator()
    for i in range(3):
        agg.add(
            [f"vid_{pid}_{i}"], [i], [0],
            np.asarray([[float(pid), float(i)]], np.float32), [pid],
        )
    merged = gather_across_processes(agg)
    vids, _, logits = merged.state_arrays()

    # collective orbax save from all processes into the shared dir
    save_checkpoint(os.path.join(outdir, "ckpt"), state, step=2)

    out = {
        "pid": pid,
        "loss_avg": stats["loss"],
        "merged_vids": sorted(str(v) for v in vids),
        "merged_logit_sum": float(np.asarray(logits).sum()),
        "final_step": int(state.step),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
