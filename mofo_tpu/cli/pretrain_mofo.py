"""MOFO motion-aware pretraining entry point.

Parity with run_mae_pretraining_BB.py: same runner as cli.pretrain with
--mask_type tube_bb defaults (the reference runner differs only in the BB
dataset/engine wiring and the gradual loss-weight list; both live in
cli.pretrain here). Note the reference runner as shipped has NameErrors in
its wiring (run_mae_pretraining_BB.py:183,271 — SURVEY.md 2.8); this
implements the documented intent.
"""

from mofo_tpu.cli.pretrain import get_args, main

if __name__ == "__main__":
    main(get_args(mofo_defaults=True))
