"""MAE pretraining runner (plain VideoMAE and MOFO motion-aware).

CLI parity with run_mae_pretraining.py:22-132 (flag names and defaults)
plus the BB flags of run_mae_pretraining_BB.py (--mask_type tube_bb,
--mask_ratio_BB, the gradual loss-weight schedule). One runner covers both
reference entry points; mofo_tpu.cli.pretrain_mofo presets the MOFO flags.

Usage:
  python -m mofo_tpu.cli.pretrain --data_path train.csv --output_dir out/
  python -m mofo_tpu.cli.pretrain --synthetic 64 --epochs 2 ...   # smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.core import distributed
from mofo_tpu.core.config import MaskingConfig, MeshSpec, OptimizerConfig, PretrainConfig


def get_args(argv=None, mofo_defaults: bool = False):
    p = argparse.ArgumentParser(
        "MOFO-TPU pre-training", add_help=True
    )
    p.add_argument("--batch_size", default=12, type=int,
                   help="per-device batch size")
    p.add_argument("--epochs", default=800, type=int)
    p.add_argument("--save_ckpt_freq", default=50, type=int)
    p.add_argument("--update_freq", default=1, type=int)
    # model
    p.add_argument("--model",
                   default="pretrain_videomae_base_patch16_224", type=str)
    p.add_argument("--decoder_depth", default=4, type=int)
    p.add_argument("--mask_type", default="tube_bb" if mofo_defaults
                   else "tube", choices=["tube", "tube_bb"], type=str)
    p.add_argument("--mask_ratio", default=0.9, type=float)
    p.add_argument("--mask_ratio_BB", default=0.75, type=float)
    p.add_argument("--bug_compat", action="store_true",
                   help="reproduce reference masking quirks")
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--sampling_rate", default=2, type=int)
    p.add_argument("--tubelet_size", default=2, type=int)
    p.add_argument("--drop_path", default=0.0, type=float)
    p.add_argument("--normlize_target", default=True, type=bool,
                   help="(reference spelling) normalized pixel targets")
    # optimizer
    p.add_argument("--opt", default="adamw", type=str)
    p.add_argument("--opt_eps", default=1e-8, type=float)
    p.add_argument("--opt_betas", default=[0.9, 0.95], type=float,
                   nargs="+")
    p.add_argument("--clip_grad", default=None, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--weight_decay_end", default=None, type=float)
    p.add_argument("--lr", default=1.5e-4, type=float)
    p.add_argument("--warmup_lr", default=1e-6, type=float)
    p.add_argument("--min_lr", default=1e-5, type=float)
    p.add_argument("--warmup_epochs", default=40, type=int)
    p.add_argument("--warmup_steps", default=-1, type=int)
    # data
    p.add_argument("--data_path", default=None, type=str,
                   help="train list csv ('path label' lines)")
    p.add_argument("--bb_json", default=None, type=str,
                   help="Unsupervised_BB_*.json motion boxes")
    p.add_argument("--synthetic", default=0, type=int,
                   help="use N synthetic clips instead of --data_path")
    p.add_argument("--decode_height", default=256, type=int)
    p.add_argument("--decode_width", default=320, type=int)
    p.add_argument("--num_workers", default=1, type=int)
    # misc
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--no_auto_resume", action="store_false",
                   dest="auto_resume")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    # mesh
    p.add_argument("--mesh_data", default=-1, type=int)
    p.add_argument("--mesh_fsdp", default=1, type=int)
    p.add_argument("--mesh_model", default=1, type=int)
    p.add_argument("--steps_per_epoch", default=None, type=int,
                   help="override (for synthetic data)")
    return p.parse_args(argv)


def build_config(args) -> PretrainConfig:
    return PretrainConfig(
        model=args.model,
        decoder_depth=args.decoder_depth,
        input_size=args.input_size,
        num_frames=args.num_frames,
        tubelet_size=args.tubelet_size,
        drop_path=args.drop_path,
        normalize_target=args.normlize_target,
        batch_size=args.batch_size,
        epochs=args.epochs,
        save_ckpt_freq=args.save_ckpt_freq,
        update_freq=args.update_freq,
        seed=args.seed,
        dtype=args.dtype,
        masking=MaskingConfig(
            mask_type=args.mask_type,
            mask_ratio=args.mask_ratio,
            mask_ratio_bb=args.mask_ratio_BB,
            bug_compat=args.bug_compat,
        ),
        optimizer=OptimizerConfig(
            opt=args.opt,
            lr=args.lr,
            min_lr=args.min_lr,
            warmup_lr=args.warmup_lr,
            warmup_epochs=args.warmup_epochs,
            warmup_steps=args.warmup_steps,
            weight_decay=args.weight_decay,
            weight_decay_end=args.weight_decay_end,
            opt_betas=tuple(args.opt_betas),
            opt_eps=args.opt_eps,
            clip_grad=args.clip_grad,
        ),
        mesh=MeshSpec(args.mesh_data, args.mesh_fsdp, args.mesh_model),
        motion_loss_weight=args.mask_type == "tube_bb",
    )


def main(args=None):
    if args is None:
        args = get_args()
    from mofo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    distributed.init_distributed_mode()
    log = distributed.setup_printing()
    cfg = build_config(args)
    log(f"config: {cfg}")

    from mofo_tpu.data import pipeline as P
    from mofo_tpu.data.filelist import MotionBoxIndex, read_setting_file
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import augment as A
    from mofo_tpu.parallel import mesh as mesh_lib
    from mofo_tpu.train import checkpoint as ckpt
    from mofo_tpu.train import metrics as M
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    mesh = mesh_lib.build_mesh(
        mesh_lib.MeshConfig(cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.model)
    )
    n_devices = jax.device_count()
    log(f"devices: {n_devices}; mesh {dict(mesh.shape)}")

    # ----- data -----
    with_boxes = cfg.masking.mask_type == "tube_bb"
    if args.synthetic:
        dataset = P.SyntheticClipDataset(
            n=args.synthetic,
            num_frames=cfg.num_frames,
            decode_size=(args.decode_height, args.decode_width),
            with_boxes=with_boxes,
        )
    else:
        entries = read_setting_file(args.data_path)
        boxes = (
            MotionBoxIndex.from_file(args.bb_json)
            if args.bb_json
            else None
        )
        if with_boxes and boxes is None:
            raise SystemExit("--mask_type tube_bb requires --bb_json")
        dataset = P.PretrainClipDataset(
            entries=entries,
            num_frames=cfg.num_frames,
            sampling_rate=args.sampling_rate,
            decode_size=(args.decode_height, args.decode_width),
            boxes=boxes,
        )
    global_batch = cfg.batch_size * n_devices
    sampler = P.ShardedSampler(
        len(dataset),
        rank=distributed.process_index(),
        world=distributed.process_count(),
        seed=cfg.seed,
    )
    per_host_batch = global_batch // distributed.process_count()
    loader = P.PrefetchLoader(
        dataset,
        batch_size=per_host_batch,
        sampler=sampler,
        sharding=mesh_lib.batch_sharding(mesh),
    )
    steps_per_epoch = args.steps_per_epoch or max(len(loader), 1)

    # ----- model & optimizer -----
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model_kwargs = dict(
        decoder_depth=cfg.decoder_depth,
        drop_path_rate=cfg.drop_path,
        num_frames=cfg.num_frames,
        tubelet_size=cfg.tubelet_size,
        img_size=cfg.input_size,
        dtype=dtype,
    )
    if optim.is_second_order(args.opt):
        # the Hutchinson probe differentiates the backward pass; the
        # Pallas flash bwd kernels define only a first-order VJP
        model_kwargs["attn_impl"] = "xla"
        log("second-order optimizer: attention routed through XLA")
    model = create_model(cfg.model, **model_kwargs)
    lr = schedules.scaled_lr(cfg.optimizer.lr, global_batch)
    log(f"base lr: {cfg.optimizer.lr:.2e}  scaled lr: {lr:.2e}")
    lr_sched = schedules.cosine_schedule(
        lr, cfg.optimizer.min_lr, cfg.epochs, steps_per_epoch,
        cfg.optimizer.warmup_epochs, cfg.optimizer.warmup_lr,
        cfg.optimizer.warmup_steps,
    )
    wd_sched = None
    if cfg.optimizer.weight_decay_end is not None:
        wd_sched = schedules.cosine_schedule(
            cfg.optimizer.weight_decay, cfg.optimizer.weight_decay_end,
            cfg.epochs, steps_per_epoch,
        )

    rng = jax.random.PRNGKey(cfg.seed)
    init_clip = jnp.zeros(
        (1, cfg.num_frames, cfg.input_size, cfg.input_size, 3)
    )
    vis0 = jnp.zeros((1, cfg.num_tokens - cfg.num_masked), jnp.int32)
    msk0 = jnp.zeros((1, cfg.num_masked), jnp.int32)
    params = model.init(rng, init_clip, vis0, msk0)["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    log(f"params: {n_params / 1e6:.2f}M")

    tx = optim.create_optimizer(
        params,
        opt=cfg.optimizer.opt,
        lr_schedule=lr_sched,
        wd_schedule=wd_sched,
        weight_decay=cfg.optimizer.weight_decay,
        betas=cfg.optimizer.opt_betas,
        eps=cfg.optimizer.opt_eps,
        clip_grad=cfg.optimizer.clip_grad,
    )
    params = mesh_lib.shard_params(params, mesh)
    state = TrainState.create(params, tx)
    # epoch-stable jit input types (see mesh_lib.place_state): without
    # this the epoch-1 step silently retraces and recompiles
    state = mesh_lib.place_state(state, mesh)

    start_epoch = args.start_epoch
    if args.auto_resume and args.output_dir:
        resumed = ckpt.auto_resume(args.output_dir, state)
        if resumed is not None:
            state, start_epoch = resumed
            start_epoch += 1
            log(f"auto-resumed at epoch {start_epoch}")

    # gradual MOFO loss weighting (run_mae_pretraining_BB.py:262)
    loss_weights = np.linspace(1, 0, cfg.epochs)

    # device-side augmentation runs INSIDE the jitted step: decode->update
    # is one XLA program per step
    out_size = cfg.input_size

    def augment_batch(arng, batch):
        clips = batch["clip"]
        boxes = batch.get("boxes")
        clips, boxes = A.pretrain_augment(
            arng, clips, out_size=out_size, boxes=boxes
        )
        out = {"clip": clips}
        if boxes is not None:
            out["boxes"] = boxes
        return out

    step_fn = jax.jit(
        make_pretrain_step(model, tx, cfg, lr_sched,
                           augment_fn=augment_batch,
                           second_order=optim.is_second_order(args.opt)),
        donate_argnums=(0,),
    )

    from mofo_tpu.train.wandb_compat import WandbLogger

    jsonl = M.JsonlLogger(args.output_dir,
                          distributed.is_main_process())
    wandb = WandbLogger(
        project=os.environ.get("WANDB_PROJECT"),
        group=os.environ.get("WANDB_GROUP"),
        name=os.environ.get("WANDB_NAME"),
        config=vars(args),
        enabled=distributed.is_main_process(),
    )
    tb = M.TensorboardLogger(args.log_dir)
    run_rng = jax.random.PRNGKey(cfg.seed + 1)

    log(f"Start training for {cfg.epochs} epochs "
        f"({steps_per_epoch} steps/epoch)")
    t_start = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        sampler.set_epoch(epoch)
        logger = M.MetricLogger(print_fn=log)
        header = f"Epoch: [{epoch}]"
        lw = float(loss_weights[epoch]) if cfg.motion_loss_weight else 0.0
        for step, batch in enumerate(
            logger.log_every(loader, 10, header, total=steps_per_epoch)
        ):
            state, m = step_fn(state, batch, run_rng, lw)
            logger.update(
                loss=float(m["loss"]),
                grad_norm=float(m["grad_norm"]),
                lr=float(m.get("lr", 0.0)),
            )
            tb.update(head="loss", step=int(state.step),
                      loss=float(m["loss"]))
            if not np.isfinite(float(m["loss"])):
                log(f"Loss is {float(m['loss'])}, stopping training")
                sys.exit(1)
        stats = {f"train_{k}": v for k, v in logger.epoch_stats().items()}
        stats.update({"epoch": epoch})
        jsonl.write(stats)
        wandb.log(stats, step=epoch)
        if args.output_dir and (
            (epoch + 1) % cfg.save_ckpt_freq == 0
            or epoch + 1 == cfg.epochs
        ):
            # orbax saves of sharded arrays are collective: every process
            # must participate (each writes its own shards); only logging
            # stays rank-0
            ckpt.save_checkpoint(args.output_dir, state, step=epoch)
            if distributed.is_main_process():
                log(f"saved checkpoint-{epoch}")
    total = time.time() - t_start
    log(f"Training time {total:.0f}s")
    return state


if __name__ == "__main__":
    main()
