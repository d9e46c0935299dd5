"""MOFO BB-focused finetuning entry point (run_class_finetuning_BB.py
parity: vit_base_patch16_224_BB_focused with --fusing_mode, BB datasets)."""

from mofo_tpu.cli.finetune import get_args, main

if __name__ == "__main__":
    main(get_args(bb_defaults=True))
