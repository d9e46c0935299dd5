"""Classification finetuning runner (plain and MOFO BB-focused).

CLI parity with run_class_finetuning.py:31-214 / run_class_finetuning_BB.py
(flag names, defaults, flow): build train/val/test datasets, mixup,
initialize the backbone from a pretraining checkpoint, layer-wise LR decay,
cosine schedules, per-epoch validation with best-checkpoint tracking and
early stopping, then multi-view final test with softmax-mean merge (and
EK-100 verb/noun marginalization when an action_to_vn map is given).

Usage:
  python -m mofo_tpu.cli.finetune --data_path train.csv --val_path val.csv \
      --finetune out/checkpoint-799 --nb_classes 174 --output_dir ft/
  python -m mofo_tpu.cli.finetune --synthetic 64 --nb_classes 10 ...  # smoke
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.core import distributed
from mofo_tpu.core.config import FinetuneConfig, MeshSpec, OptimizerConfig


def get_args(argv=None, bb_defaults: bool = False):
    p = argparse.ArgumentParser("MOFO-TPU finetuning", add_help=True)
    p.add_argument("--batch_size", default=10, type=int)
    # decode thread-pool size per host (reference DataLoader
    # num_workers=4, run_class_finetuning.py)
    p.add_argument("--num_workers", default=1, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--update_freq", default=1, type=int)
    p.add_argument("--save_ckpt_freq", default=10, type=int)
    # model
    default_model = (
        "vit_base_patch16_224_BB_focused" if bb_defaults
        else "vit_base_patch16_224"
    )
    p.add_argument("--model", default=default_model, type=str)
    p.add_argument("--fusing_mode", default="MCA", type=str,
                   choices=["MCA", "soft_attn", "weighted_mean", "org"])
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--sampling_rate", default=4, type=int)
    p.add_argument("--tubelet_size", default=2, type=int)
    p.add_argument("--drop", default=0.0, type=float)
    p.add_argument("--attn_drop_rate", default=0.0, type=float)
    p.add_argument("--drop_path", default=0.1, type=float)
    p.add_argument("--init_scale", default=0.001, type=float)
    p.add_argument("--use_mean_pooling", default=True, type=bool)
    p.add_argument("--nb_classes", default=174, type=int)
    p.add_argument("--model_ema", action="store_true", default=False)
    p.add_argument("--model_ema_decay", default=0.9999, type=float)
    # optimizer
    p.add_argument("--opt", default="adamw", type=str)
    p.add_argument("--opt_eps", default=1e-8, type=float)
    p.add_argument("--opt_betas", default=[0.9, 0.999], type=float,
                   nargs="+")
    p.add_argument("--clip_grad", default=None, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--weight_decay_end", default=None, type=float)
    p.add_argument("--lr", default=5e-4, type=float)
    p.add_argument("--layer_decay", default=0.75, type=float)
    p.add_argument("--warmup_lr", default=1e-6, type=float)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--warmup_epochs", default=5, type=int)
    p.add_argument("--warmup_steps", default=-1, type=int)
    # augmentation
    p.add_argument("--color_jitter", default=0.4, type=float)
    p.add_argument("--aa", default="rand-m7-n4-mstd0.5-inc1", type=str)
    p.add_argument("--smoothing", default=0.1, type=float)
    p.add_argument("--reprob", default=0.25, type=float)
    p.add_argument("--mixup", default=0.8, type=float)
    p.add_argument("--cutmix", default=1.0, type=float)
    p.add_argument("--mixup_prob", default=1.0, type=float)
    p.add_argument("--mixup_switch_prob", default=0.5, type=float)
    p.add_argument("--mixup_mode", default="batch", type=str)
    p.add_argument("--no_flip", action="store_true",
                   help="disable hflip (SSV2/EK convention)")
    # eval
    p.add_argument("--test_num_segment", default=2, type=int)
    p.add_argument("--test_num_crop", default=3, type=int)
    p.add_argument("--dist_eval", action="store_true", default=True)
    p.add_argument("--eval", action="store_true",
                   help="evaluation only")
    p.add_argument("--early_stop_patience", default=-1, type=int,
                   help="stop after N epochs without val-loss improvement")
    p.add_argument("--only_finetune_last", action="store_true",
                   help="freeze the backbone, train fusing/head only")
    p.add_argument("--num_sample", default=1, type=int,
                   help="repeated augmentation copies per clip")
    # checkpoints
    p.add_argument("--finetune", default="",
                   help="pretrain checkpoint (orbax dir or torch .pth)")
    p.add_argument("--resume", default="")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--start_epoch", default=0, type=int)
    # data
    p.add_argument("--data_path", default=None, type=str)
    p.add_argument("--val_path", default=None, type=str)
    p.add_argument("--test_path", default=None, type=str)
    p.add_argument("--bb_json", default=None, type=str)
    p.add_argument("--data_set", default="SSV2", type=str,
                   choices=["SSV2", "Kinetics-400", "UCF101", "HMDB51",
                            "EK100"])
    p.add_argument("--classtype", default="action", type=str,
                   choices=["verb", "noun", "action"],
                   help="EK100 label space")
    p.add_argument("--data_root", default=None, type=str,
                   help="EK100 video root (train/ validation/ subdirs)")
    p.add_argument("--synthetic", default=0, type=int)
    p.add_argument("--decode_height", default=256, type=int)
    p.add_argument("--decode_width", default=320, type=int)
    # misc
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float16", "float32"],
                   help="compute dtype; float16 enables dynamic loss "
                        "scaling (DeepSpeed fp16 parity)")
    p.add_argument("--mesh_data", default=-1, type=int)
    p.add_argument("--mesh_fsdp", default=1, type=int)
    p.add_argument("--mesh_model", default=1, type=int)
    return p.parse_args(argv)


def dataclasses_replace_nb(cfg: FinetuneConfig, nb: int) -> FinetuneConfig:
    import dataclasses

    return dataclasses.replace(cfg, nb_classes=nb)


def build_config(args) -> FinetuneConfig:
    return FinetuneConfig(
        model=args.model,
        nb_classes=args.nb_classes,
        input_size=args.input_size,
        num_frames=args.num_frames,
        tubelet_size=args.tubelet_size,
        drop=args.drop,
        attn_drop_rate=args.attn_drop_rate,
        drop_path=args.drop_path,
        init_scale=args.init_scale,
        use_mean_pooling=args.use_mean_pooling,
        batch_size=args.batch_size,
        epochs=args.epochs,
        update_freq=args.update_freq,
        save_ckpt_freq=args.save_ckpt_freq,
        seed=args.seed,
        dtype=args.dtype,
        model_ema=args.model_ema,
        model_ema_decay=args.model_ema_decay,
        aa=args.aa,
        smoothing=args.smoothing,
        reprob=args.reprob,
        mixup=args.mixup,
        cutmix=args.cutmix,
        mixup_prob=args.mixup_prob,
        mixup_switch_prob=args.mixup_switch_prob,
        mixup_mode=args.mixup_mode,
        test_num_segment=args.test_num_segment,
        test_num_crop=args.test_num_crop,
        fusing_mode=args.fusing_mode,
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
            layer_decay=args.layer_decay,
        ),
        mesh=MeshSpec(args.mesh_data, args.mesh_fsdp, args.mesh_model),
    )


def _load_pretrain_encoder(path: str):
    """Load a pretrain checkpoint's encoder tree from either an orbax
    TrainState dir or a torch .pth (run_class_finetuning.py:350-383)."""
    from mofo_tpu.train import checkpoint as ckpt

    if path.endswith(".pth") or path.endswith(".pt"):
        sd = ckpt.load_torch_checkpoint(path)
        return ckpt.import_torch_pretrain(sd)["encoder"]
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    params = tree["params"] if "params" in tree else tree
    return params["encoder"]


def main(args=None):
    if args is None:
        args = get_args()
    from mofo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    distributed.init_distributed_mode()
    log = distributed.setup_printing()
    cfg = build_config(args)
    bb_focused = "BB_focused" in cfg.model
    log(f"config: {cfg}")

    from mofo_tpu.data import pipeline as P
    from mofo_tpu.data.filelist import MotionBoxIndex, read_setting_file
    from mofo_tpu.eval.multiview import MultiViewAggregator
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import augment as A
    from mofo_tpu.parallel import mesh as mesh_lib
    from mofo_tpu.train import checkpoint as ckpt
    from mofo_tpu.train import metrics as M
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.finetune_step import (
        make_eval_step,
        make_finetune_step,
    )
    from mofo_tpu.train.train_state import TrainState

    mesh = mesh_lib.build_mesh(
        mesh_lib.MeshConfig(cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.model)
    )
    n_devices = jax.device_count()
    global_batch = cfg.batch_size * n_devices

    # ----- datasets -----
    sampler_kind = "dense" if args.data_set in (
        "Kinetics-400", "UCF101", "HMDB51") else "uniform"
    decode_size = (args.decode_height, args.decode_width)
    boxes = (
        MotionBoxIndex.from_file(args.bb_json) if args.bb_json else None
    )
    if bb_focused and boxes is None and not args.synthetic:
        raise SystemExit("BB-focused model requires --bb_json")
    action_to_vn = None
    if args.synthetic:
        mk = lambda mode: P.SyntheticClipDataset(
            n=args.synthetic,
            num_frames=cfg.num_frames,
            decode_size=decode_size,
            num_classes=cfg.nb_classes,
            with_boxes=bb_focused,
        )
        train_ds, val_ds = mk("train"), mk("validation")
        test_ds = P.SyntheticClipDataset(
            n=args.synthetic, num_frames=cfg.num_frames,
            decode_size=decode_size, num_classes=cfg.nb_classes,
            with_boxes=bb_focused,
        )
    elif args.data_set == "EK100":
        # EPIC-KITCHENS: --data_path/--val_path are the EPIC_100 CSVs,
        # --data_root holds the pre-cut video_<i>.mp4 segments
        from mofo_tpu.data.epic import EpicClipDataset
        from mofo_tpu.data.filelist import epic_action_space, read_epic_csv

        vn_list, mapping, action_to_vn = epic_action_space(
            [args.data_path, args.val_path]
        )
        if args.classtype == "action" and cfg.nb_classes != len(vn_list):
            log(f"nb_classes -> {len(vn_list)} (EK action space)")
            cfg = dataclasses_replace_nb(cfg, len(vn_list))
        mk_epic = lambda csv_path, split, mode: EpicClipDataset(
            entries=read_epic_csv(csv_path),
            video_root=args.data_root,
            split=split,
            mode=mode,
            classtype=args.classtype,
            action_mapping=mapping,
            num_frames=cfg.num_frames,
            decode_size=decode_size,
            test_num_segment=cfg.test_num_segment,
            test_num_crop=cfg.test_num_crop,
            boxes=boxes,
        )
        train_ds = mk_epic(args.data_path, "train", "train")
        val_ds = mk_epic(args.val_path, "validation", "validation")
        test_ds = mk_epic(args.val_path, "validation", "test")
    else:
        mk = lambda path, mode: P.FinetuneClipDataset(
            entries=read_setting_file(path),
            mode=mode,
            sampler=sampler_kind,
            num_frames=cfg.num_frames,
            frame_sample_rate=args.sampling_rate,
            decode_size=decode_size,
            test_num_segment=cfg.test_num_segment,
            test_num_crop=cfg.test_num_crop,
            boxes=boxes,
        )
        train_ds = mk(args.data_path, "train")
        val_ds = mk(args.val_path or args.data_path, "validation")
        test_ds = mk(args.test_path or args.val_path or args.data_path,
                     "test")

    rank, world = distributed.process_index(), distributed.process_count()
    per_host = global_batch // world
    train_sampler = P.ShardedSampler(len(train_ds), rank, world,
                                     seed=cfg.seed)
    train_loader = P.PrefetchLoader(
        train_ds, per_host, train_sampler,
        sharding=mesh_lib.batch_sharding(mesh),
        num_workers=args.num_workers,
    )
    val_loader = P.PrefetchLoader(
        val_ds, per_host,
        P.ShardedSampler(len(val_ds), rank, world, shuffle=False),
        sharding=mesh_lib.batch_sharding(mesh), drop_last=False,
        num_workers=args.num_workers,
    )
    steps_per_epoch = max(len(train_loader), 1)

    # ----- model -----
    dtype = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
    }[cfg.dtype]
    model_kwargs = dict(
        img_size=cfg.input_size,
        all_frames=cfg.num_frames,
        tubelet_size=cfg.tubelet_size,
        num_classes=cfg.nb_classes,
        drop_rate=cfg.drop,
        attn_drop_rate=cfg.attn_drop_rate,
        drop_path_rate=cfg.drop_path,
        init_scale=cfg.init_scale,
        use_mean_pooling=cfg.use_mean_pooling,
        dtype=dtype,
    )
    if bb_focused:
        model_kwargs["fusing_method"] = cfg.fusing_mode
    if optim.is_second_order(args.opt):
        # the Hutchinson probe differentiates the backward pass; the
        # Pallas flash bwd kernels define only a first-order VJP
        model_kwargs["attn_impl"] = "xla"
        log("second-order optimizer: attention routed through XLA")
    model = create_model(cfg.model, **model_kwargs)

    rng = jax.random.PRNGKey(cfg.seed)
    init_clip = jnp.zeros(
        (1, cfg.num_frames, cfg.input_size, cfg.input_size, 3)
    )
    if bb_focused:
        init_boxes = jnp.zeros((1, cfg.num_frames, 4))
        params = model.init(rng, init_clip, init_boxes)["params"]
    else:
        params = model.init(rng, init_clip)["params"]
    log(f"params: {sum(p.size for p in jax.tree.leaves(params))/1e6:.2f}M")

    if args.finetune:
        encoder = _load_pretrain_encoder(args.finetune)
        params = ckpt.finetune_init_from_pretrain(params, encoder)
        log(f"initialized backbone from {args.finetune}")

    # ----- optimizer -----
    lr = schedules.scaled_lr(cfg.optimizer.lr, global_batch)
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
    depth = getattr(model, "depth", 12)
    trainable = None
    if args.only_finetune_last:
        # freeze the ViT backbone; train the head / fc_norm / fusing
        # modules (the reference declared this flag without implementing
        # the freeze, run_class_finetuning_BB.py:141)
        from mofo_tpu.train.optim import path_names

        head_names = {"head", "fc_norm", "soft_att_local",
                      "soft_att_global"}

        def trainable(path, leaf):
            names = path_names(path)
            return any(
                n in head_names or n.startswith("local_MCA")
                or n.startswith("global_MCA")
                for n in names
            )

    tx = optim.create_optimizer(
        params,
        opt=cfg.optimizer.opt,
        lr_schedule=lr_sched,
        wd_schedule=wd_sched,
        weight_decay=cfg.optimizer.weight_decay,
        betas=cfg.optimizer.opt_betas,
        eps=cfg.optimizer.opt_eps,
        clip_grad=cfg.optimizer.clip_grad,
        layer_decay=cfg.optimizer.layer_decay,
        depth=depth,
        trainable=trainable,
    )
    params = mesh_lib.shard_params(params, mesh)
    ls = None
    if cfg.dtype == "float16":
        # DeepSpeed fp16 defaults: initial_scale_power 7, window 128
        # (reference utils.py:499-528)
        from mofo_tpu.train.loss_scale import DynamicLossScale

        ls = DynamicLossScale.create()
    state = TrainState.create(
        params, tx, use_ema=cfg.model_ema, loss_scale=ls
    )
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

    # ----- jitted programs -----
    flip = not (args.no_flip or args.data_set in ("SSV2", "EK100"))

    def train_augment(arng, batch):
        clips = batch["clip"]
        labels = batch["label"]
        boxes_in = batch.get("boxes")
        if args.num_sample > 1:
            # repeated augmentation (multiple_samples_collate,
            # utils.py:530-552): each copy draws fresh augmentation
            # randomness; mixup then acts on the flattened batch
            k = args.num_sample
            clips = jnp.repeat(clips, k, axis=0)
            labels = jnp.repeat(labels, k, axis=0)
            if boxes_in is not None:
                boxes_in = jnp.repeat(boxes_in, k, axis=0)
        clips, boxes_t = A.finetune_augment(
            arng, clips, out_size=cfg.input_size, aa=cfg.aa,
            flip=flip, reprob=cfg.reprob, boxes=boxes_in,
        )
        out = {"clip": clips, "label": labels}
        if boxes_t is not None:
            out["boxes"] = boxes_t
        return out

    @jax.jit
    def val_augment(batch):
        clips, boxes_t = A.eval_augment(
            batch["clip"], out_size=cfg.input_size,
            short_side=cfg.input_size, boxes=batch.get("boxes"),
        )
        out = {"clip": clips, "label": batch["label"]}
        if boxes_t is not None:
            out["boxes"] = boxes_t
        if "valid" in batch:
            out["valid"] = batch["valid"]
        return out

    step_fn = jax.jit(
        make_finetune_step(model, tx, cfg, lr_sched,
                           bb_focused=bb_focused,
                           augment_fn=train_augment,
                           second_order=optim.is_second_order(args.opt)),
        donate_argnums=(0,),
    )
    eval_fn = jax.jit(make_eval_step(model, cfg, bb_focused=bb_focused))

    from mofo_tpu.train.wandb_compat import WandbLogger

    jsonl = M.JsonlLogger(args.output_dir, distributed.is_main_process())
    wandb = WandbLogger(
        project=os.environ.get("WANDB_PROJECT"),
        group=os.environ.get("WANDB_GROUP"),
        name=os.environ.get("WANDB_NAME"),
        config=vars(args),
        enabled=distributed.is_main_process(),
    )
    run_rng = jax.random.PRNGKey(cfg.seed + 1)

    def run_validation(params):
        logger = M.MetricLogger(print_fn=log)
        for batch in val_loader:
            batch = val_augment(batch)
            out = eval_fn(params, batch)
            n = int(out.get("n_valid", batch["label"].shape[0]))
            logger.update_weighted(
                n,
                loss=float(out["loss"]), acc1=float(out["acc1"]),
                acc5=float(out["acc5"]),
            )
        stats = logger.epoch_stats(sync=True)
        log(f"* Acc@1 {stats.get('acc1', 0):.3f} "
            f"Acc@5 {stats.get('acc5', 0):.3f} "
            f"loss {stats.get('loss', 0):.3f}")
        return stats

    if args.eval:
        stats = run_validation(state.params)
        return stats

    # ----- train loop (run_class_finetuning.py:529-608) -----
    best_acc1 = -1.0
    best_val_loss = float("inf")
    stall = 0
    t0 = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        train_sampler.set_epoch(epoch)
        logger = M.MetricLogger(print_fn=log)
        header = f"Epoch: [{epoch}]"
        for batch in logger.log_every(train_loader, 10, header,
                                      total=steps_per_epoch):
            state, m = step_fn(state, batch, run_rng)
            logger.update(loss=float(m["loss"]),
                          grad_norm=float(m["grad_norm"]),
                          lr=float(m.get("lr", 0.0)))
            if not np.isfinite(float(m["loss"])):
                log(f"Loss is {float(m['loss'])}, stopping training")
                sys.exit(2)
        val_stats = run_validation(state.params)
        stats = {f"train_{k}": v for k, v in logger.epoch_stats().items()}
        stats.update({f"val_{k}": v for k, v in val_stats.items()})
        if cfg.model_ema and state.ema_params is not None:
            # timm ModelEma evaluation (run_class_finetuning.py model_ema)
            ema_stats = run_validation(state.ema_params)
            stats.update(
                {f"val_ema_{k}": v for k, v in ema_stats.items()}
            )
        stats["epoch"] = epoch
        jsonl.write(stats)
        wandb.log(stats, step=epoch)
        if args.output_dir:
            # orbax saves of sharded arrays are collective: every process
            # must call save (each writes its own shards); val_stats is
            # process-synced (epoch_stats(sync=True)) so the best-ckpt
            # decision agrees across processes
            if (epoch + 1) % cfg.save_ckpt_freq == 0 or \
               epoch + 1 == cfg.epochs:
                ckpt.save_checkpoint(args.output_dir, state, step=epoch)
            if val_stats.get("acc1", 0.0) > best_acc1:
                best_acc1 = val_stats["acc1"]
                ckpt.save_checkpoint(args.output_dir, state, step=epoch,
                                     name="checkpoint-best")
                if distributed.is_main_process():
                    log(f"new best acc1 {best_acc1:.3f}")
        # early stopping on val loss (run_class_finetuning.py:582-598)
        if args.early_stop_patience > 0:
            if val_stats.get("loss", 0.0) < best_val_loss - 1e-6:
                best_val_loss = val_stats["loss"]
                stall = 0
            else:
                stall += 1
                if stall >= args.early_stop_patience:
                    log(f"early stopping at epoch {epoch}")
                    break
    log(f"Training time {time.time()-t0:.0f}s; best acc1 {best_acc1:.3f}")

    # ----- final multi-view test (engine_for_finetuning.py:227-348) -----
    if args.output_dir:
        best = os.path.join(args.output_dir, "checkpoint-best")
        if os.path.exists(best):
            state = ckpt.restore_checkpoint(best, state)
            log("loaded checkpoint-best for final test")
    final_test(
        model, state.params, test_ds, cfg, mesh,
        bb_focused=bb_focused, log=log, per_host=per_host,
        action_to_vn=action_to_vn if args.classtype == "action" else None,
        num_workers=args.num_workers,
    )
    return state


def final_test(model, params, test_ds, cfg, mesh, bb_focused, log,
               per_host, action_to_vn=None, num_workers: int = 1):
    """Multi-view test: iterate (chunk, crop) expanded views, aggregate
    softmax-mean per video."""
    from mofo_tpu.data import pipeline as P
    from mofo_tpu.eval.multiview import MultiViewAggregator
    from mofo_tpu.ops import augment as A
    from mofo_tpu.parallel import mesh as mesh_lib
    from mofo_tpu.train.finetune_step import make_eval_step
    from mofo_tpu.core import distributed

    rank, world = distributed.process_index(), distributed.process_count()
    loader = P.PrefetchLoader(
        test_ds, per_host,
        P.ShardedSampler(len(test_ds), rank, world, shuffle=False),
        sharding=mesh_lib.batch_sharding(mesh), drop_last=False,
        num_workers=num_workers,
    )
    eval_fn = jax.jit(make_eval_step(model, cfg, bb_focused=bb_focused))

    agg = MultiViewAggregator()
    n_crops = cfg.test_num_crop

    view_augs = [
        jax.jit(
            lambda b, s=s: A.test_view_augment(
                b, s, out_size=cfg.input_size, short_side=cfg.input_size,
                num_crops=n_crops,
            )[0]
        )
        for s in range(n_crops)
    ]
    # BB-focused: boxes must follow the clips through the resize + view
    # window into crop space, or the in-box token map is misaligned
    # (the reference's BB test transforms track the bbox end-to-end,
    # video_transforms_BB_focused.py).
    view_augs_bb = [
        jax.jit(
            lambda c, bx, s=s: A.test_view_augment(
                c, s, out_size=cfg.input_size, short_side=cfg.input_size,
                num_crops=n_crops, boxes=bx,
            )
        )
        for s in range(n_crops)
    ]
    for batch in loader:
        # group by split_nb on host (views need different crop windows);
        # drop rows the loader padded in to keep batches mesh-divisible
        split = np.asarray(batch["split_nb"])
        valid = np.asarray(
            batch.get("valid", np.ones(split.shape[0], bool))
        )
        clips = batch["clip"]
        for s in range(n_crops):
            sel = np.nonzero((split == s) & valid)[0]
            if len(sel) == 0:
                continue
            sub = {
                k: (v[jnp.asarray(sel)] if hasattr(v, "shape") else v)
                for k, v in batch.items()
            }
            if bb_focused:
                raw_boxes = sub.get(
                    "boxes",
                    jnp.zeros((len(sel), cfg.num_frames, 4)),
                )
                aug_clips, aug_boxes = view_augs_bb[s](
                    sub["clip"], raw_boxes
                )
                eb = {
                    "clip": aug_clips,
                    "label": sub["label"],
                    "boxes": aug_boxes,
                }
            else:
                aug_clips = view_augs[s](sub["clip"])
                eb = {"clip": aug_clips, "label": sub["label"]}
            out = eval_fn(params, eb)
            agg.add(
                [str(int(v)) for v in np.asarray(sub["video_idx"])],
                np.asarray(sub["chunk_nb"]).tolist(),
                np.asarray(sub["split_nb"]).tolist(),
                np.asarray(out["logits"]),
                np.asarray(sub["label"]).tolist(),
            )
    # merge every process's view rows before scoring (replaces the
    # reference's per-rank prediction files + rank-0 merge)
    from mofo_tpu.eval.multiview import gather_across_processes

    agg = gather_across_processes(agg)
    top1, top5, _ = agg.finalize()
    log(f"Final test: Acc@1 {top1:.2f} Acc@5 {top5:.2f}")
    if action_to_vn is not None:
        # EK-100: marginalize action probs into verb/noun accuracies
        # (engine_for_finetuning.py:113-123, utils.py:584-606)
        from mofo_tpu.eval.multiview import (
            get_marginal_indexes,
            marginalize,
        )

        feats, labels = agg.merge_feats()
        vids = list(feats)
        probs = np.stack([feats[v] for v in vids])
        lab = np.array([labels[v] for v in vids])
        acc = {}
        for mode in ("verb", "noun"):
            idxs = get_marginal_indexes(action_to_vn, mode)
            marg = marginalize(probs, idxs)
            true = np.array(
                [action_to_vn[l][0 if mode == "verb" else 1] for l in lab]
            )
            acc[mode] = float(
                np.mean(np.argmax(marg, axis=1) == true)
            ) * 100.0
        log(f"Final test (EK marginalized): verb {acc['verb']:.2f} "
            f"noun {acc['noun']:.2f}")
    return top1, top5


if __name__ == "__main__":
    main()
