"""Bit-parity artifact vs the reference at fixed seed.

BASELINE.json's north star: mask indices, sampled frame ids, and the
forward loss match the reference math at seed 0. This script records all
three in one JSON artifact:

  - tube + motion-BB mask indices from the numpy RNG twins
    (ops/masking.py TubeMaskingGeneratorNumpy /
    MotionTubeMaskingGeneratorNumpy — call-order transcriptions of the
    reference masking_generator.py:3-24 / 46-77) at np.random.seed(0)
  - TSN frame ids (data/sampling.tsn_frame_ids, the kinetics.py:518-540
    transcription incl. the np.random.seed(10) pin quirk) for durations
    around skip_length (31/32/33) and a long video
  - the forward reconstruction loss of the flax model vs the torch
    transcription (tests/torch_ref.py) run at float64, with targets
    computed by a literal float64 transcription of
    engine_for_pretraining.py:43-63

Usage:
  python tools/parity_artifact.py            # reduced geometry (CI)
  python tools/parity_artifact.py --full     # full ViT-B 16x224 geometry
  python tools/parity_artifact.py --out P    # write artifact JSON to P
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def mask_records(t, h, w, ratio=0.9, ratio_bb=0.75, patch=16):
    from mofo_tpu.ops.masking import (
        MotionTubeMaskingGeneratorNumpy,
        TubeMaskingGeneratorNumpy,
    )

    np.random.seed(0)
    tube = TubeMaskingGeneratorNumpy((t, h, w), ratio)()
    np.random.seed(0)
    box = np.asarray([2.0 * patch, 1.0 * patch, 6.0 * patch, 5.0 * patch])
    motion = MotionTubeMaskingGeneratorNumpy(
        (t, h, w), ratio, ratio_bb, patch_size=patch, bug_compat=True
    )(np.tile(box, (t, 1)))
    return {
        "tube_masked_idx": np.flatnonzero(tube).tolist(),
        "motion_masked_idx": np.flatnonzero(motion).tolist(),
    }


def frame_records():
    from mofo_tpu.data.sampling import tsn_frame_ids

    out = {}
    for dur in (31, 32, 33, 300):
        ids = tsn_frame_ids(
            dur, num_segments=1, skip_length=32, pin_seed=True
        )
        out[str(dur)] = np.asarray(ids).tolist()
    return out


def loss_record(full: bool):
    import jax
    import jax.numpy as jnp
    import torch
    from einops import rearrange

    import torch_ref
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import masking, patchify

    if full:
        geom = dict(img=224, frames=16, enc_dim=768, enc_depth=12,
                    enc_heads=12, dec_dim=384, dec_depth=4, dec_heads=6)
    else:
        geom = dict(img=32, frames=4, enc_dim=64, enc_depth=2,
                    enc_heads=2, dec_dim=32, dec_depth=2, dec_heads=2)
    patch, tub = 16, 2
    hp = geom["img"] // patch
    tp = geom["frames"] // tub
    dec_classes = tub * patch * patch * 3

    model = create_model(
        "pretrain_videomae_base_patch16_224",
        img_size=geom["img"],
        num_frames=geom["frames"],
        encoder_embed_dim=geom["enc_dim"],
        encoder_depth=geom["enc_depth"],
        encoder_num_heads=geom["enc_heads"],
        decoder_embed_dim=geom["dec_dim"],
        decoder_depth=geom["dec_depth"],
        decoder_num_heads=geom["dec_heads"],
        decoder_num_classes=dec_classes,
    )

    # reference-twin mask at seed 0
    np.random.seed(0)
    from mofo_tpu.ops.masking import TubeMaskingGeneratorNumpy

    mask_np = TubeMaskingGeneratorNumpy((tp, hp, hp), 0.9)()
    mask = jnp.asarray(mask_np[None], jnp.bool_)
    n_masked = int(mask_np.sum())
    vis_idx, masked_idx = masking.mask_to_indices(mask, n_masked)

    clip_np = np.random.RandomState(0).randn(
        1, geom["frames"], geom["img"], geom["img"], 3
    ).astype(np.float32) * 0.5
    clip = jnp.asarray(clip_np)
    params = model.init(jax.random.PRNGKey(1), clip, vis_idx, masked_idx)

    # ours: f32 prediction + target + loss
    pred = model.apply(params, clip, vis_idx, masked_idx)
    tokens = patchify.patchify_flat(clip, patch_size=patch,
                                    tubelet_size=tub)
    targets = patchify.masked_normalized_targets(
        tokens, masked_idx, normalize_target=True,
        compute_dtype=jnp.float32,
    )
    ours_loss = float(patchify.masked_mse_loss(pred, targets))

    # torch transcription at float64
    ref = torch_ref.RefPretrain(
        img_size=geom["img"], patch_size=patch,
        enc_dim=geom["enc_dim"], enc_depth=geom["enc_depth"],
        enc_heads=geom["enc_heads"], dec_dim=geom["dec_dim"],
        dec_depth=geom["dec_depth"], dec_heads=geom["dec_heads"],
        dec_classes=dec_classes, num_frames=geom["frames"],
        tubelet_size=tub,
    )
    torch_ref.load_pretrain(ref, params["params"])
    ref = ref.double().eval()
    clip_t = torch.from_numpy(
        np.transpose(clip_np, (0, 4, 1, 2, 3))
    ).double()  # (B, C, T, H, W)
    mask_t = torch.from_numpy(mask_np[None].astype(bool))
    with torch.no_grad():
        out_t = ref(clip_t, mask_t)
        # target math: engine_for_pretraining.py:43-63 at float64
        mean = torch.tensor([0.485, 0.456, 0.406]).double()[
            None, :, None, None, None]
        std = torch.tensor([0.229, 0.224, 0.225]).double()[
            None, :, None, None, None]
        unnorm = clip_t * std + mean
        sq = rearrange(
            unnorm, "b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c",
            p0=tub, p1=patch, p2=patch,
        )
        norm = (sq - sq.mean(dim=-2, keepdim=True)) / (
            sq.var(dim=-2, unbiased=True, keepdim=True).sqrt() + 1e-6
        )
        vp = rearrange(norm, "b n p c -> b n (p c)")
        labels = vp[mask_t].reshape(1, -1, vp.shape[-1])
        ref_loss = float(
            torch.nn.functional.mse_loss(out_t, labels).item()
        )
    return {
        "geometry": geom,
        "n_masked": n_masked,
        "ours_loss_f32": ours_loss,
        "torch_loss_f64": ref_loss,
        "abs_diff": abs(ours_loss - ref_loss),
    }


def curve_record(n_steps: int = 25):
    """TRAINING-LOSS-CURVE parity: K full train steps (model fwd+bwd +
    AdamW with the reference decay grouping + per-step reference-twin
    masks, all jointly) vs the torch transcription driving the reference
    engine mechanics (engine_for_pretraining.py:29-196 loss/backward/
    step, utils.py:391-408 scaler-less path, optim_factory.py:37-71
    param groups). Both sides run float64 — requires JAX_ENABLE_X64=1.

    This is the north-star check the single-forward record cannot give:
    a drift anywhere in gradients, optimizer mechanics, schedules, or
    masking compounds over steps and shows up in the curve.
    """
    import jax

    assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
    import jax.numpy as jnp
    import optax
    import torch
    from einops import rearrange

    import torch_ref
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import masking, patchify
    from mofo_tpu.ops.masking import TubeMaskingGeneratorNumpy
    from mofo_tpu.train import optim as optim_lib

    geom = dict(img=32, frames=4, enc_dim=64, enc_depth=2, enc_heads=2,
                dec_dim=32, dec_depth=2, dec_heads=2)
    patch, tub = 16, 2
    hp = geom["img"] // patch
    tp = geom["frames"] // tub
    dec_classes = tub * patch * patch * 3
    base_lr, min_lr, warmup, epochs, spe = 1.5e-3, 1e-5, 1, 5, 5
    wd, betas, eps = 0.05, (0.9, 0.95), 1e-8

    from mofo_tpu.train import schedules

    lr_arr = np.asarray(
        schedules.cosine_schedule(base_lr, min_lr, epochs, spe, warmup),
        np.float64,
    )

    model = create_model(
        "pretrain_videomae_base_patch16_224",
        img_size=geom["img"], num_frames=geom["frames"],
        encoder_embed_dim=geom["enc_dim"], encoder_depth=geom["enc_depth"],
        encoder_num_heads=geom["enc_heads"],
        decoder_embed_dim=geom["dec_dim"], decoder_depth=geom["dec_depth"],
        decoder_num_heads=geom["dec_heads"],
        decoder_num_classes=dec_classes, dtype=jnp.float64,
    )

    # per-step reference-twin masks and clips, identical on both sides
    np.random.seed(0)
    gen = TubeMaskingGeneratorNumpy((tp, hp, hp), 0.5)
    masks_np = [gen() for _ in range(n_steps)]
    n_masked = int(masks_np[0].sum())
    clips_np = [
        np.random.RandomState(2000 + s).randn(
            2, geom["frames"], geom["img"], geom["img"], 3
        ).astype(np.float64) * 0.5
        for s in range(n_steps)
    ]

    mask0 = jnp.asarray(np.stack([masks_np[0]] * 2), jnp.bool_)
    vis0, msk0 = masking.mask_to_indices(mask0, n_masked)
    params = model.init(
        jax.random.PRNGKey(1), jnp.asarray(clips_np[0]), vis0, msk0
    )["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.float64), params)
    init_params = jax.tree.map(np.asarray, params)  # shared starting point

    tx = optim_lib.create_optimizer(
        params, lr_schedule=lr_arr, betas=betas, eps=eps,
        weight_decay=wd,
    )
    opt_state = tx.init(params)

    def loss_fn(params, clip, vis, msk):
        pred = model.apply(
            {"params": params}, clip, vis, msk, deterministic=True
        )
        tokens = patchify.patchify_flat(
            clip, patch_size=patch, tubelet_size=tub
        )
        targets = patchify.masked_normalized_targets(
            tokens, msk, normalize_target=True,
            compute_dtype=jnp.float64,
        )
        return patchify.masked_mse_loss(pred, targets)

    @jax.jit
    def train_step(params, opt_state, clip, vis, msk):
        loss, grads = jax.value_and_grad(loss_fn)(params, clip, vis, msk)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    ours_losses = []
    for s in range(n_steps):
        mask = jnp.asarray(np.stack([masks_np[s]] * 2), jnp.bool_)
        vis, msk = masking.mask_to_indices(mask, n_masked)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(clips_np[s]), vis, msk
        )
        ours_losses.append(float(loss))

    # ---- torch transcription of the reference engine mechanics
    ref = torch_ref.RefPretrain(
        img_size=geom["img"], patch_size=patch,
        enc_dim=geom["enc_dim"], enc_depth=geom["enc_depth"],
        enc_heads=geom["enc_heads"], dec_dim=geom["dec_dim"],
        dec_depth=geom["dec_depth"], dec_heads=geom["dec_heads"],
        dec_classes=dec_classes, num_frames=geom["frames"],
        tubelet_size=tub,
    )
    # load the SAME f64 init (identical starting point)
    torch_ref.load_pretrain(ref, init_params)
    ref = ref.double().train()
    # reference param grouping (optim_factory.py:37-71): no decay for
    # ndim<=1, .bias, and the skip list — the exact rule decay_mask
    # mirrors
    skip = {"pos_embed", "cls_token", "mask_token"}
    decay, no_decay = [], []
    for name, p in ref.named_parameters():
        leaf = name.split(".")[-1]
        if p.ndim <= 1 or name.endswith(".bias") or leaf in skip:
            no_decay.append(p)
        else:
            decay.append(p)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": wd},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=float(lr_arr[0]), betas=betas, eps=eps,
    )
    mean_t = torch.tensor([0.485, 0.456, 0.406]).double()[
        None, :, None, None, None]
    std_t = torch.tensor([0.229, 0.224, 0.225]).double()[
        None, :, None, None, None]
    ref_losses = []
    for s in range(n_steps):
        for g in opt.param_groups:
            g["lr"] = float(lr_arr[s])  # per-step LR assignment
        clip_t = torch.from_numpy(
            np.transpose(clips_np[s], (0, 4, 1, 2, 3))
        ).double()
        mask_t = torch.from_numpy(
            np.stack([masks_np[s]] * 2).astype(bool)
        )
        with torch.no_grad():
            unnorm = clip_t * std_t + mean_t
            sq = rearrange(
                unnorm,
                "b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c",
                p0=tub, p1=patch, p2=patch,
            )
            norm = (sq - sq.mean(dim=-2, keepdim=True)) / (
                sq.var(dim=-2, unbiased=True, keepdim=True).sqrt() + 1e-6
            )
            vp = rearrange(norm, "b n p c -> b n (p c)")
            labels = vp[mask_t].reshape(2, -1, vp.shape[-1])
        out_t = ref(clip_t, mask_t)
        loss_t = torch.nn.functional.mse_loss(out_t, labels)
        opt.zero_grad()
        loss_t.backward()
        opt.step()
        ref_losses.append(float(loss_t.item()))

    rel = [
        abs(a - b) / max(abs(b), 1e-12)
        for a, b in zip(ours_losses, ref_losses)
    ]
    return {
        "geometry": geom,
        "n_steps": n_steps,
        "weight_decay": wd,
        "ours_losses": ours_losses,
        "torch_losses": ref_losses,
        "max_rel_diff": max(rel),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full ViT-B geometry (slow on CPU)")
    ap.add_argument("--curve", action="store_true",
                    help="25-step training-loss-curve parity "
                         "(requires JAX_ENABLE_X64=1)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="run the flax side on the TPU backend")
    args = ap.parse_args()

    if not args.tpu:
        # parity is a host-precision exercise; also the axon sitecustomize
        # pins the TPU platform unless overridden before first device use
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.curve:
        artifact = {"seed": 0, "loss_curve": curve_record()}
        text = json.dumps(artifact, indent=1)
        if args.out:
            Path(args.out).write_text(text)
            print(f"wrote {args.out}")
        print(json.dumps(
            {"curve_max_rel_diff": artifact["loss_curve"]["max_rel_diff"]}
        ))
        return

    t, h = (8, 14) if args.full else (2, 2)
    artifact = {
        "seed": 0,
        "masks": mask_records(t, h, h),
        "tsn_frames_pin_seed": frame_records(),
        "forward_loss": loss_record(args.full),
    }
    text = json.dumps(artifact, indent=1)
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {args.out}")
    diff = artifact["forward_loss"]["abs_diff"]
    print(json.dumps({"loss_parity_abs_diff": diff,
                      "ours": artifact["forward_loss"]["ours_loss_f32"],
                      "torch_f64": artifact["forward_loss"]
                      ["torch_loss_f64"]}))


if __name__ == "__main__":
    main()
