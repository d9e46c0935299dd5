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
    ap.add_argument("--mode", choices=["thread", "process", "both"],
                    default="thread")
    ap.add_argument("--target-cps", type=float, default=446.6,
                    help="chip step rate to size the host against "
                         "(BENCH_r04 ViT-B pretrain)")
    ap.add_argument("--out", default=None,
                    help="also write the full artifact to this path")
    args = ap.parse_args()

    from mofo_tpu.data.filelist import ClipEntry
    from mofo_tpu.data.pipeline import PrefetchLoader, PretrainClipDataset

    record = {
        "metric": "input-pipeline host sizing",
        "host_cpus": os.cpu_count(),
        "curves": [],
    }
    with tempfile.TemporaryDirectory() as root:
        paths = make_videos(root, args.n_videos, frames=args.frames)
        entries = [ClipEntry(p, 0) for p in paths]
        ds = PretrainClipDataset(entries, num_frames=16, sampling_rate=2)

        # CPU-seconds per clip: the host-sizing primitive. On an
        # N-core production host the decode pool scales until
        # clips/s ~= N / cpu_s_per_clip, so the cores needed to feed a
        # chip at target_cps = target_cps * cpu_s_per_clip (+ margin).
        # Measured serially with process_time so a contended 1-core dev
        # box still yields the right number.
        n_probe = min(len(ds), 8)
        ds[0]  # warm page caches / lazy imports
        c0, w0 = time.process_time(), time.perf_counter()
        for i in range(n_probe):
            ds[i]
        cpu_s = (time.process_time() - c0) / n_probe
        wall_s = (time.perf_counter() - w0) / n_probe
        cores_needed = args.target_cps * cpu_s
        sizing = {
            "cpu_s_per_clip": round(cpu_s, 4),
            "wall_s_per_clip_serial": round(wall_s, 4),
            "target_cps": args.target_cps,
            "cores_to_feed_target": round(cores_needed, 1),
        }
        print(json.dumps({"metric": "host-sizing", **sizing}))
        record["sizing"] = sizing

        modes = (
            ["thread", "process"] if args.mode == "both" else [args.mode]
        )
        for mode in modes:
            for nw in args.workers:
                loader = PrefetchLoader(
                    ds, min(args.batch, len(ds)), to_device=False,
                    num_workers=nw, drop_last=False, worker_mode=mode,
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
                point = {
                    "metric": "input-pipeline clips/s (host decode)",
                    "value": round(n / dt, 2),
                    "unit": "clips/s",
                    "num_workers": nw,
                    "worker_mode": mode,
                    "host_cpus": os.cpu_count(),
                }
                print(json.dumps(point))
                record["curves"].append(point)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
