"""Input-pipeline throughput: end-to-end clips/s from real mp4 decode.

Measures the host side the reference covers with
DataLoader(num_workers=4) per rank (run_mae_pretraining.py:196-206):
synthesize mp4s at the decode resolution, build PretrainClipDataset +
PrefetchLoader with N decode workers, and time full batches (TSN
sampling + FFmpeg decode + collate; no device work).

Prints one JSON line per worker count. Note: this dev box exposes ONE
CPU core, so absolute numbers here are a lower bound and worker scaling
is flat; on a production host (e.g. 224-vCPU v5e host VM) the thread
pool scales until NIC/disk limits.

Usage: python tools/bench_input.py [--n-videos 8] [--batches 6]
"""

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_videos(root, n, frames=64, size=(320, 256)):
    import cv2

    paths = []
    rng = np.random.RandomState(0)
    for i in range(n):
        p = os.path.join(root, f"v{i:03d}.mp4")
        w = cv2.VideoWriter(
            p, cv2.VideoWriter_fourcc(*"mp4v"), 30, size
        )
        base = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
        for t in range(frames):
            # shifting pattern so inter-frame prediction stays realistic
            frame = np.roll(base, t * 3, axis=1)
            w.write(frame)
        w.release()
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    from mofo_tpu.data.filelist import ClipEntry
    from mofo_tpu.data.pipeline import PrefetchLoader, PretrainClipDataset

    with tempfile.TemporaryDirectory() as root:
        paths = make_videos(root, args.n_videos, frames=args.frames)
        entries = [ClipEntry(p, 0) for p in paths]
        ds = PretrainClipDataset(entries, num_frames=16, sampling_rate=2)

        for nw in args.workers:
            loader = PrefetchLoader(
                ds, min(args.batch, len(ds)), to_device=False,
                num_workers=nw, drop_last=False,
            )
            it = iter(loader)
            next(it)  # warm the pool / page caches
            t0 = time.perf_counter()
            n = 0
            for _ in range(args.batches - 1):
                batch = next(it, None)
                if batch is None:
                    it = iter(loader)
                    batch = next(it)
                n += batch["clip"].shape[0]
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "input-pipeline clips/s (host decode)",
                "value": round(n / dt, 2),
                "unit": "clips/s",
                "num_workers": nw,
                "host_cpus": os.cpu_count(),
            }))


if __name__ == "__main__":
    main()
