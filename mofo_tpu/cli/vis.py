"""MAE reconstruction visualization (run_videomae_vis.py parity).

Loads one video, samples a fixed 16-frame clip, runs the pretrain model
with a tube mask, and writes ori/mask/rec JPEG frames. The per-patch
un-normalization uses the ORIGINAL patch mean/std (run_videomae_vis.py /
engine_for_pretraining.py:74-79), so reconstructions are viewable even
with normalized-pixel targets.

Usage:
  python -m mofo_tpu.cli.vis --img_path v.mp4 --save_path out/ \
      --model_path ckpt_dir_or.pth
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.core import constants


def get_args(argv=None):
    p = argparse.ArgumentParser("MAE visualization")
    p.add_argument("--img_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--model_path", default=None,
                   help="pretrain checkpoint (orbax dir or torch .pth)")
    p.add_argument("--model",
                   default="pretrain_videomae_base_patch16_224")
    p.add_argument("--decoder_depth", default=4, type=int)
    p.add_argument("--mask_ratio", default=0.9, type=float)
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--sampling_rate", default=4, type=int)
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def main(args=None):
    if args is None:
        args = get_args()
    import cv2

    from mofo_tpu.data.video_reader import VideoReader
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import image as I
    from mofo_tpu.ops import masking, patchify

    os.makedirs(args.save_path, exist_ok=True)

    with VideoReader(args.img_path) as vr:
        duration = len(vr)
        # fixed frame grid like run_videomae_vis (uniform ids)
        tick = duration / float(args.num_frames)
        ids = np.array(
            [int(tick / 2.0 + tick * x) for x in range(args.num_frames)]
        )
        frames = vr.get_batch(np.clip(ids, 0, duration - 1))

    clips = jnp.asarray(frames[None].astype(np.float32)) / 255.0
    rh, rw = I.short_side_scale_size(
        frames.shape[1], frames.shape[2], args.input_size
    )
    clips = I.resize(clips, (rh, rw))
    crop = I.center_crop_boxes(1, (rh, rw),
                               (args.input_size, args.input_size))
    clips = I.crop_and_resize(clips, crop,
                              (args.input_size, args.input_size))
    normed = I.normalize(clips)

    model = create_model(args.model, decoder_depth=args.decoder_depth,
                         num_frames=args.num_frames,
                         img_size=args.input_size)
    t_pos = args.num_frames // 2
    ppf = (args.input_size // 16) ** 2
    mask = masking.tube_mask(
        jax.random.PRNGKey(args.seed), 1, temporal_positions=t_pos,
        patches_per_frame=ppf, mask_ratio=args.mask_ratio,
    )
    n_masked = t_pos * masking.num_masked_per_frame(ppf, args.mask_ratio)
    vis_idx, masked_idx = masking.mask_to_indices(mask, n_masked)

    if args.model_path:
        from mofo_tpu.cli.finetune import _load_pretrain_encoder  # noqa
        from mofo_tpu.train import checkpoint as ckpt

        if args.model_path.endswith((".pth", ".pt")):
            params = ckpt.import_torch_pretrain(
                ckpt.load_torch_checkpoint(args.model_path)
            )
        else:
            import orbax.checkpoint as ocp

            tree = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.model_path)
            )
            params = tree["params"] if "params" in tree else tree
    else:
        params = model.init(
            jax.random.PRNGKey(0), normed, vis_idx, masked_idx
        )["params"]

    pred = model.apply({"params": params}, normed, vis_idx, masked_idx)

    # rebuild full pixel video: visible patches from input, masked from
    # prediction un-normalized with original patch stats
    targets = patchify.patchify(
        patchify.unnormalize_clip(normed), 16, 2
    )  # (1, N, P, C)
    mean = jnp.mean(targets, axis=-2, keepdims=True)
    n = targets.shape[-2]
    var = jnp.var(targets, axis=-2, keepdims=True) * (n / (n - 1))
    std = jnp.sqrt(var) + 1e-6
    P, C = targets.shape[-2], targets.shape[-1]
    pred_patches = pred.reshape(pred.shape[0], pred.shape[1], P, C)
    mean_m = jnp.take_along_axis(
        mean, masked_idx[..., None, None], axis=1)
    std_m = jnp.take_along_axis(std, masked_idx[..., None, None], axis=1)
    pred_pix = pred_patches * std_m + mean_m

    recon = targets
    recon = jax.vmap(
        lambda r, idx, p: r.at[idx].set(p)
    )(recon, masked_idx, pred_pix)
    masked_vis = jax.vmap(
        lambda r, idx: r.at[idx].set(0.5)
    )(targets, masked_idx)

    t, s = args.num_frames // 2, args.input_size // 16
    for name, data in (
        ("ori", targets), ("rec", recon), ("mask", masked_vis)
    ):
        video = np.asarray(
            patchify.unpatchify(data, t, s, s)
        )[0]
        for i, frame in enumerate(video):
            out = np.clip(frame * 255.0, 0, 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(args.save_path, f"{name}_img{i}.jpg"),
                out[:, :, ::-1],
            )
    print(f"wrote {3 * args.num_frames} frames to {args.save_path}")


if __name__ == "__main__":
    main()
