"""Saliency visualization: Grad-CAM(++), attention rollout, grad x input.

Covers the capability of GradCAM_videoMAE_MOFO.py (pytorch-grad-cam on
the token grid with bbox overlay) the JAX-native way:
  - Grad-CAM / Grad-CAM++: class-discriminative maps at the same target
    layer as the reference (blocks[layer].norm1, GradCAM_videoMAE_MOFO.py:
    293-301) via a flax method-interceptor + additive-perturbation VJP
  - attention rollout (Abnar & Zuidema '20) over the ViT blocks
  - gradient saliency: d logit[class] / d input, token-pooled
Rendered as per-frame heatmap overlays (+ optional motion-box rectangle).

Usage:
  python -m mofo_tpu.cli.attention_vis --video v.mp4 --save_path out/ \
      [--model_path ckpt] [--method gradcam++ --layer 5] \
      [--bb_json boxes.json]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("MOFO saliency visualization")
    p.add_argument("--video", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--model_path", default=None)
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--nb_classes", default=174, type=int)
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--method", default="grad",
                   choices=["grad", "rollout", "gradcam", "gradcam++"])
    p.add_argument("--layer", default=5, type=int,
                   help="target block for gradcam methods")
    p.add_argument("--target_class", default=-1, type=int,
                   help="-1 = argmax")
    p.add_argument("--bb_json", default=None)
    return p.parse_args(argv)


def token_saliency_rollout(model_kwargs, params, clips, create_model_fn):
    """Attention rollout (Abnar & Zuidema '20): per block, average the
    sown softmax over heads, add identity, row-normalize, and multiply
    through; token importance = mean over query rows of the final rollout.
    Returns (B, t, h, h)."""
    import jax.numpy as jnp

    model = create_model_fn(
        **{**model_kwargs, "sow_attn": True, "attn_impl": "xla"}
    )
    _, inter = model.apply(
        {"params": params}, clips, mutable=["intermediates"]
    )
    def _block_index(path) -> int:
        for p in path:
            name = getattr(p, "key", None)
            if isinstance(name, str) and name.startswith("blocks_"):
                return int(name.split("_")[-1])
        return 0

    mats = [
        v
        for _, v in sorted(
            jax.tree_util.tree_flatten_with_path(
                inter["intermediates"]
            )[0],
            key=lambda kv: _block_index(kv[0]),
        )
    ]
    B = clips.shape[0]
    N = mats[0].shape[-1]
    rollout = jnp.eye(N)[None].repeat(B, axis=0)
    for a in mats:  # (B, H, N, N)
        a = jnp.mean(a, axis=1)
        a = a + jnp.eye(N)[None]
        a = a / jnp.sum(a, axis=-1, keepdims=True)
        rollout = jnp.einsum("bij,bjk->bik", a, rollout)
    sal = jnp.mean(rollout, axis=1)  # (B, N)
    t = clips.shape[1] // 2
    h = clips.shape[2] // 16
    return sal.reshape(B, t, h, h)


def token_saliency_grad(model, params, clips, target_class: int):
    """|d logit / d input| pooled per token -> (B, t, h, w)."""

    def logit_fn(x):
        logits = model.apply({"params": params}, x)
        cls = (
            jnp.argmax(logits, axis=-1)
            if target_class < 0
            else jnp.full((x.shape[0],), target_class)
        )
        return jnp.sum(
            jnp.take_along_axis(logits, cls[:, None], axis=-1)
        )

    g = jax.grad(logit_fn)(clips)  # (B, T, H, W, C)
    B, T, H, W, C = g.shape
    sal = jnp.abs(g).sum(-1)  # (B, T, H, W)
    t, p = T // 2, 16
    h = H // p
    sal = sal.reshape(B, t, 2, h, p, h, p).sum(axis=(2, 4, 6))
    return sal  # (B, t, h, h)


def token_saliency_gradcam(
    model, params, clips, target_class: int, layer: int,
    plus: bool = False,
):
    """Grad-CAM / Grad-CAM++ on the token grid -> (B, t, h, h).

    Target layer matches the reference (blocks[layer].norm1). The layer
    activations A and class-score gradients dS/dA are obtained in one
    VJP by adding a zero perturbation to the norm1 output through a flax
    method interceptor: grad w.r.t. the perturbation IS dS/dA, and the
    activation rides out as an aux output.
    """
    from flax import linen as nn

    B, T, S = clips.shape[0], clips.shape[1], clips.shape[2]
    t, h = T // 2, S // 16
    N = t * h * h
    D = params[f"blocks_{layer}"]["norm1"]["scale"].shape[0]
    target = (f"blocks_{layer}", "norm1")

    def run(pert, x):
        captured = []

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            path = tuple(context.module.path)
            if path[-2:] == target and not captured:
                captured.append(out.astype(jnp.float32))
                out = out + pert.astype(out.dtype)
            return out

        with nn.intercept_methods(interceptor):
            logits = model.apply({"params": params}, x)
        cls = (
            jnp.argmax(logits, axis=-1)
            if target_class < 0
            else jnp.full((x.shape[0],), target_class)
        )
        score = jnp.sum(
            jnp.take_along_axis(logits, cls[:, None], axis=-1)
        )
        return score, captured[0]

    zeros = jnp.zeros((B, N, D), jnp.float32)
    (_, acts), grads = jax.value_and_grad(run, has_aux=True)(zeros, clips)
    # acts, grads: (B, N, D)
    if plus:
        # Grad-CAM++ (Chattopadhay et al. '18), spatial axis = tokens:
        # alpha = g^2 / (2 g^2 + sum_n A g^3); w_d = sum_n alpha relu(g)
        g2 = grads * grads
        g3 = g2 * grads
        denom = 2.0 * g2 + jnp.sum(acts * g3, axis=1, keepdims=True)
        alpha = jnp.where(g2 > 0, g2 / (denom + 1e-8), 0.0)
        w = jnp.sum(alpha * jax.nn.relu(grads), axis=1)  # (B, D)
    else:
        w = jnp.mean(grads, axis=1)  # (B, D)
    cam = jax.nn.relu(jnp.einsum("bnd,bd->bn", acts, w))
    return cam.reshape(B, t, h, h)


def main(args=None):
    if args is None:
        args = get_args()
    import cv2

    from mofo_tpu.data.video_reader import VideoReader
    from mofo_tpu.data.filelist import MotionBoxIndex
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import image as I
    from mofo_tpu.train import checkpoint as ckpt

    os.makedirs(args.save_path, exist_ok=True)
    with VideoReader(args.video) as vr:
        duration = len(vr)
        tick = duration / float(args.num_frames)
        ids = np.clip(
            [int(tick / 2 + tick * x) for x in range(args.num_frames)],
            0, duration - 1,
        )
        frames = vr.get_batch(ids)

    clips = jnp.asarray(frames[None].astype(np.float32)) / 255.0
    rh, rw = I.short_side_scale_size(
        frames.shape[1], frames.shape[2], args.input_size
    )
    clips = I.resize(clips, (rh, rw))
    crop = I.center_crop_boxes(
        1, (rh, rw), (args.input_size, args.input_size)
    )
    clips = I.crop_and_resize(
        clips, crop, (args.input_size, args.input_size)
    )
    display = np.asarray(clips[0])  # (T, S, S, 3) in [0, 1]
    normed = I.normalize(clips)

    model = create_model(
        args.model, img_size=args.input_size,
        all_frames=args.num_frames, num_classes=args.nb_classes,
    )
    params = model.init(jax.random.PRNGKey(0), normed)["params"]
    if args.model_path:
        if args.model_path.endswith((".pth", ".pt")):
            loaded = ckpt.import_torch_finetune(
                ckpt.load_torch_checkpoint(args.model_path)
            )
        else:
            import orbax.checkpoint as ocp

            tree = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.model_path)
            )
            loaded = tree["params"] if "params" in tree else tree
        params = ckpt.finetune_init_from_pretrain(params, loaded)

    if args.method == "rollout":
        model_kwargs = dict(
            img_size=args.input_size, all_frames=args.num_frames,
            num_classes=args.nb_classes,
        )
        sal = np.asarray(
            token_saliency_rollout(
                model_kwargs, params, normed,
                lambda **kw: create_model(args.model, **kw),
            )
        )[0]
    elif args.method in ("gradcam", "gradcam++"):
        sal = np.asarray(
            token_saliency_gradcam(
                model, params, normed, args.target_class, args.layer,
                plus=args.method.endswith("++"),
            )
        )[0]
    else:
        sal = np.asarray(
            token_saliency_grad(model, params, normed, args.target_class)
        )[0]  # (t, h, h)
    sal = sal / (sal.max() + 1e-9)

    boxes = None
    if args.bb_json:
        idx = MotionBoxIndex.from_file(args.bb_json)
        boxes = idx.get(MotionBoxIndex.video_key(args.video), ids)

    t_pos = sal.shape[0]
    for i in range(args.num_frames):
        frame = (display[i] * 255).astype(np.uint8)[:, :, ::-1].copy()
        heat = cv2.resize(
            (sal[min(i // 2, t_pos - 1)] * 255).astype(np.uint8),
            (args.input_size, args.input_size),
        )
        heat = cv2.applyColorMap(heat, cv2.COLORMAP_JET)
        overlay = cv2.addWeighted(frame, 0.6, heat, 0.4, 0)
        if boxes is not None:
            x1, y1, x2, y2 = (int(v) for v in boxes[i])
            cv2.rectangle(overlay, (x1, y1), (x2, y2), (0, 255, 0), 2)
        cv2.imwrite(
            os.path.join(args.save_path, f"saliency_{i:02d}.jpg"), overlay
        )
    print(f"wrote {args.num_frames} saliency frames to {args.save_path}")


if __name__ == "__main__":
    main()
