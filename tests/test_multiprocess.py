"""REAL 2-process distributed execution test.

Round-2 review finding: every multi-host surface was covered only by
monkeypatching jax.process_count. This test spawns two actual Python
processes that form one JAX distributed system over localhost (Gloo CPU
collectives, 4 virtual devices each -> 8 global) and runs the genuine
multi-process branches end-to-end via tests/mp_worker.py: distributed
init from torch-style env vars, shard_params' make_array_from_callback
placement, make_array_from_process_local_data feeding, sharded train
steps with cross-process psum, epoch_stats(sync=True),
gather_across_processes, and a collective orbax save. Results must
match a single-process 8-device run of the identical computation.

Reference behavior replaced: DDP init utils.py:255-296 and the
filesystem eval merge engine_for_finetuning.py:281-339.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["RANK"] = str(pid)
        env["WORLD_SIZE"] = "2"
        env["MASTER_ADDR"] = "127.0.0.1"
        env["MASTER_PORT"] = str(port)
        env["PYTHONPATH"] = (
            REPO + os.pathsep + env.get("PYTHONPATH", "")
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
                 str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    # ---- single-process reference: identical computation on the
    # in-process 8-virtual-device CPU backend (conftest forces it)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mofo_tpu.parallel import mesh as mesh_lib
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
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
    state = state.replace(params=mesh_lib.shard_params(state.params, mesh))
    sharding = NamedSharding(mesh, P(("data", "fsdp")))
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
    rng = jax.random.PRNGKey(2)
    losses = []
    for it in range(2):
        full = np.random.RandomState(100 + it).rand(
            8, cfg.num_frames, cfg.input_size, cfg.input_size, 3
        ).astype(np.float32)
        clip = jax.device_put(full, sharding)
        state, metrics = step(state, {"clip": clip}, rng, 0.0)
        losses.append(float(metrics["loss"]))
    expected_avg = float(np.mean(losses))

    for r in results:
        # the distributed run reduces with Gloo (different summation
        # order than the local 8-device psum) -> tight-but-not-bitwise
        assert abs(r["loss_avg"] - expected_avg) < 1e-5, (
            r["loss_avg"], expected_avg,
        )
        assert r["final_step"] == 2
        # eval merge saw both processes' rows, identically on each
        assert r["merged_vids"] == sorted(
            f"vid_{p}_{i}" for p in range(2) for i in range(3)
        )
        # sum over all logits: proc p contributes 3*p + (0+1+2)
        assert r["merged_logit_sum"] == pytest.approx(9.0)
    assert results[0]["loss_avg"] == results[1]["loss_avg"]

    # the collective orbax save produced one complete checkpoint
    ckpt = tmp_path / "ckpt" / "checkpoint-2"
    assert ckpt.is_dir(), list(tmp_path.iterdir())
    # restorable in THIS (single-)process against the same template
    from mofo_tpu.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(str(ckpt), state)
    assert int(restored.step) == 2
