"""CLI-level end-to-end smoke tests on the virtual CPU mesh: pretrain and
finetune runners with tiny geometry + synthetic data, checkpoint resume,
eval-only mode."""

import glob
import json
import os

import numpy as np
import pytest

from mofo_tpu.cli import finetune as FT
from mofo_tpu.cli import pretrain as PT

TINY_PRETRAIN = [
    "--model", "pretrain_videomae_tiny_debug",
    "--decoder_depth", "1",
    "--synthetic", "32",
    "--batch_size", "2",
    "--input_size", "32",
    "--num_frames", "4",
    "--epochs", "1",
    "--warmup_epochs", "0",
    "--save_ckpt_freq", "1",
    "--decode_height", "48",
    "--decode_width", "64",
    "--dtype", "float32",
]

TINY_FINETUNE = [
    "--model", "vit_tiny_debug",
    "--synthetic", "32",
    "--batch_size", "2",
    "--input_size", "32",
    "--num_frames", "4",
    "--nb_classes", "3",
    "--epochs", "1",
    "--warmup_epochs", "0",
    "--save_ckpt_freq", "1",
    "--decode_height", "48",
    "--decode_width", "64",
    "--aa", "rand-m7-n1-mstd0.5-inc1",
    "--dtype", "float32",
    "--drop_path", "0.0",
]


class TestPretrainCLI:
    def test_runs_and_checkpoints(self, tmp_path):
        out = str(tmp_path / "pt")
        state = PT.main(PT.get_args(TINY_PRETRAIN + ["--output_dir", out]))
        assert int(state.step) == 2  # 8 clips / batch 2... per-device
        assert os.path.isdir(os.path.join(out, "checkpoint-0"))
        log = open(os.path.join(out, "log.txt")).read().strip()
        stats = json.loads(log.splitlines()[-1])
        assert np.isfinite(stats["train_loss"])

    def test_mofo_masking_path(self, tmp_path):
        out = str(tmp_path / "pt_bb")
        args = PT.get_args(
            TINY_PRETRAIN
            + ["--output_dir", out, "--mask_type", "tube_bb"]
        )
        state = PT.main(args)
        assert int(state.step) > 0

    def test_auto_resume_skips_done_epochs(self, tmp_path):
        out = str(tmp_path / "pt2")
        PT.main(PT.get_args(TINY_PRETRAIN + ["--output_dir", out]))
        # rerun with same epochs: resumes past the end, no new steps
        state = PT.main(PT.get_args(TINY_PRETRAIN + ["--output_dir", out]))
        assert int(state.step) == 2


class TestFinetuneCLI:
    def test_full_cycle(self, tmp_path, capsys):
        out = str(tmp_path / "ft")
        state = FT.main(
            FT.get_args(TINY_FINETUNE + ["--output_dir", out])
        )
        assert int(state.step) == 2
        assert os.path.isdir(os.path.join(out, "checkpoint-best"))
        text = capsys.readouterr().out
        assert "Final test: Acc@1" in text

    def test_eval_only(self, tmp_path):
        stats = FT.main(FT.get_args(TINY_FINETUNE + ["--eval"]))
        assert "acc1" in stats

    def test_finetune_from_pretrain_ckpt(self, tmp_path):
        pt_out = str(tmp_path / "pt")
        PT.main(PT.get_args(TINY_PRETRAIN + ["--output_dir", pt_out]))
        ckpt = glob.glob(os.path.join(pt_out, "checkpoint-*"))[0]
        ft_out = str(tmp_path / "ft")
        state = FT.main(
            FT.get_args(
                TINY_FINETUNE
                + ["--output_dir", ft_out, "--finetune", ckpt]
            )
        )
        assert int(state.step) == 2
