"""On-chip end-to-end recipe smoke: mp4s -> pretrain -> finetune -> eval.

The CPU suite already runs the full CLI cycle on synthetic arrays
(tests/test_cli.py); this tool is the REAL-stack version, on the TPU:
FFmpeg decode through the first-party native decoder, PrefetchLoader
feeding the chip, the MOFO tube_bb pretrain loop, checkpoint surgery
into the classifier, the finetune loop (mixup + rand-augment on device),
and the eval pass — one artifact proving every layer composes on real
hardware, not just the jitted steps.

Geometry is tiny (32px, 4 frames) so compiles stay in seconds; the
point is integration, not speed. Writes one JSON line.

Usage: PYTHONPATH=/root/repo python tools/e2e_recipe.py [--out FILE]
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    t0 = time.time()

    from bench_input import make_videos

    from mofo_tpu.cli import finetune as FT
    from mofo_tpu.cli import pretrain as PT
    from mofo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix="e2e_")
    paths = make_videos(os.path.join(root), 8, frames=48, size=(128, 96))
    # 'path label' filelist; two classes split across the videos
    csv = os.path.join(root, "list.csv")
    with open(csv, "w") as f:
        for i, p in enumerate(paths):
            f.write(f"{p} {i % 2}\n")

    common = [
        "--batch_size", "4",
        "--input_size", "32",
        "--num_frames", "4",
        "--decode_height", "48",
        "--decode_width", "64",
        "--num_workers", "1",
    ]
    pt_out = os.path.join(root, "pt")
    pt_state = PT.main(PT.get_args([
        "--model", "pretrain_videomae_tiny_debug",
        "--decoder_depth", "1",
        "--data_path", csv,
        "--mask_type", "tube",  # tube_bb needs a factory bb_json;
        # the BB path is covered by bench.py + synthetic-box tests
        "--epochs", "2",
        "--warmup_epochs", "0",
        "--save_ckpt_freq", "1",
        "--output_dir", pt_out,
    ] + common))
    pt_steps = int(pt_state.step)
    ckpts = sorted(glob.glob(os.path.join(pt_out, "checkpoint-*")))
    assert ckpts, "pretrain produced no checkpoint"
    pt_log = open(os.path.join(pt_out, "log.txt")).read().strip()
    pt_loss = json.loads(pt_log.splitlines()[-1])["train_loss"]

    ft_out = os.path.join(root, "ft")
    ft_state = FT.main(FT.get_args([
        "--model", "vit_tiny_debug",
        "--data_path", csv,
        "--val_path", csv,
        "--test_path", csv,
        "--nb_classes", "2",
        "--finetune", ckpts[-1],
        "--epochs", "2",
        "--warmup_epochs", "0",
        "--save_ckpt_freq", "2",
        "--aa", "rand-m7-n1-mstd0.5-inc1",
        "--drop_path", "0.0",
        "--output_dir", ft_out,
    ] + common))
    ft_log = open(os.path.join(ft_out, "log.txt")).read().strip()
    last = json.loads(ft_log.splitlines()[-1])

    import jax

    rec = {
        "metric": "e2e recipe on-chip (decode->pretrain->surgery->"
                  "finetune->eval)",
        "device": str(jax.devices()[0].device_kind),
        "pretrain_steps": pt_steps,
        "pretrain_final_loss": pt_loss,
        "finetune_steps": int(ft_state.step),
        "finetune_last_epoch": last,
        "wall_s": round(time.time() - t0, 1),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
