"""Pooled feature extraction (MOFO_feature_extraction.py parity).

Loads a finetuned classifier (or random init), runs the validation
transform on each listed video, and writes pooled (B, D) features to .npy.

Usage:
  python -m mofo_tpu.cli.feature_extract --data_path list.csv \
      --model_path ckpt --output features.npy
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("MOFO feature extraction")
    p.add_argument("--data_path", required=True,
                   help="'path label' list or a single video file")
    p.add_argument("--output", default="features.npy")
    p.add_argument("--model_path", default=None)
    p.add_argument("--model", default="vit_base_patch16_224_feature_ext")
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    return p.parse_args(argv)


def main(args=None):
    if args is None:
        args = get_args()
    from mofo_tpu.data import pipeline as P
    from mofo_tpu.data.filelist import ClipEntry, read_setting_file
    from mofo_tpu.models import create_model
    from mofo_tpu.ops import augment as A
    from mofo_tpu.train import checkpoint as ckpt

    if args.data_path.endswith((".mp4", ".webm", ".avi", ".mkv")):
        entries = [ClipEntry(args.data_path, 0)]
    else:
        entries = read_setting_file(args.data_path)

    ds = P.FinetuneClipDataset(
        entries=entries, mode="validation", sampler="uniform",
        num_frames=args.num_frames, decode_size=(256, 320),
    )
    model = create_model(args.model, img_size=args.input_size,
                         all_frames=args.num_frames, num_classes=0)
    init_clip = jnp.zeros(
        (1, args.num_frames, args.input_size, args.input_size, 3)
    )
    params = model.init(jax.random.PRNGKey(0), init_clip)["params"]
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
        # merge whatever matches (lenient load, utils.py:299-344)
        params = ckpt.finetune_init_from_pretrain(params, loaded)

    @jax.jit
    def extract(params, clips_u8):
        clips, _ = A.eval_augment(clips_u8, out_size=args.input_size,
                                  short_side=args.input_size)
        return model.apply({"params": params}, clips,
                           return_features=True)

    loader = P.PrefetchLoader(ds, args.batch_size, drop_last=False)
    feats = []
    for batch in loader:
        feats.append(np.asarray(extract(params, batch["clip"])))
    feats = np.concatenate(feats, axis=0)
    np.save(args.output, feats)
    print(f"wrote features {feats.shape} to {args.output}")
    return feats


if __name__ == "__main__":
    main()
