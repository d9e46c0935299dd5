"""Offline motion-box factory driver.

One command replaces the reference's three-stage pipeline
(motion_map_creator.py --data-type flow / mag, then
bounding_box_creator_*.py): per video, compute optical flow (TV-L1 on
device by default), motion-boundary magnitude maps over a sliding window,
extract per-frame motion boxes with temporal cleanup and the clip-union
overwrite, and merge everything into one Unsupervised_BB JSON.

Usage:
  python -m mofo_tpu.cli.motion_factory --data_path train.csv \
      --output Unsupervised_BB_SSV2_train.json [--window 8]
  # intermediate motion-map videos: add --motion_map_dir dir/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("MOFO offline motion-box factory")
    p.add_argument("--data_path", required=True,
                   help="'path label' list or a single video")
    p.add_argument("--output", required=True, help="merged bbox json")
    p.add_argument("--flow_backend", default="tvl1",
                   choices=["tvl1", "dis", "farneback"])
    p.add_argument("--window", default=8, type=int,
                   help="motion-boundary temporal window (4 for Kinetics)")
    p.add_argument("--max_frames", default=64, type=int,
                   help="cap decoded frames per video (stride-sampled)")
    p.add_argument("--no_clip_union", action="store_true",
                   help="keep per-frame boxes (skip the union overwrite)")
    p.add_argument("--motion_map_dir", default=None,
                   help="also write motion-map mp4s here")
    return p.parse_args(argv)


def process_video(path: str, args) -> list:
    from mofo_tpu.data.video_reader import VideoReader
    from mofo_tpu.factory import bbox, flow, motion_maps

    with VideoReader(path) as vr:
        n = len(vr)
        ids = np.arange(n)
        if n > args.max_frames:
            ids = np.linspace(0, n - 1, args.max_frames).astype(np.int64)
        frames = vr.get_batch(ids)

    flows = [
        flow.compute_flow(frames[i], frames[i + 1],
                          backend=args.flow_backend)
        for i in range(len(frames) - 1)
    ]
    # per-frame magnitude maps over the sliding window; stack flow
    # components like the reference's packed flow images (x and y treated
    # as separate images in the boundary sum)
    flow_imgs = []
    for f in flows:
        flow_imgs.append(f[..., 0])
        flow_imgs.append(f[..., 1])
    mags = motion_maps.motion_magnitude_frames_np(
        flow_imgs, window=args.window
    )
    # one magnitude frame per video frame (pair x/y maps were interleaved)
    mags = mags[::2]
    if args.motion_map_dir:
        _write_motion_video(path, mags, args.motion_map_dir)
    boxes = bbox.extract_boxes(
        mags, clip_union=not args.no_clip_union
    )
    # boxes for the final frame (no outgoing flow): repeat last
    if len(boxes) < len(frames):
        boxes = list(boxes) + [boxes[-1]] * (len(frames) - len(boxes))
    return boxes


def _write_motion_video(src_path: str, mags, out_dir: str):
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    name = os.path.basename(src_path)
    h, w = mags[0].shape[:2]
    out = cv2.VideoWriter(
        os.path.join(out_dir, name),
        cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h), isColor=False,
    )
    for m in mags:
        out.write(m)
    out.release()


def main(args=None):
    if args is None:
        args = get_args()
    from mofo_tpu.data.filelist import (
        ClipEntry,
        MotionBoxIndex,
        read_setting_file,
    )
    from mofo_tpu.factory import bbox as bbox_lib

    if args.data_path.endswith((".mp4", ".webm", ".avi", ".mkv")):
        entries = [ClipEntry(args.data_path, 0)]
    else:
        entries = read_setting_file(args.data_path)

    per_video = {}
    for e in entries:
        key = MotionBoxIndex.video_key(e.path)
        try:
            per_video[key] = process_video(e.path, args)
            print(f"{key}: {len(per_video[key])} boxes")
        except Exception as exc:
            print(f"SKIP {key}: {exc}")
    bbox_lib.write_bbox_json(args.output, per_video)
    print(f"wrote {len(per_video)} videos to {args.output}")


if __name__ == "__main__":
    main()
