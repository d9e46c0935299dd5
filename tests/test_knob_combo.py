"""All perf-experiment knobs composed in ONE bf16 train step.

Each knob (MOFO_PATCHIFY=lr, MOFO_LN=mmvjp, MOFO_GELU=tanh,
MOFO_POS=arith) is individually validated elsewhere; this guards the
*composition* the chip A/B matrix runs (docs/PERF.md "Round-3 experiment
knobs"), so a combo bench run can never waste a cold remote compile on a
crash. Knob reads happen at apply time, so a monkeypatched env is enough
— no module reloads required.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofo_tpu.core.config import MaskingConfig, PretrainConfig
from mofo_tpu.models import create_model
from mofo_tpu.train import optim, schedules
from mofo_tpu.train.pretrain_step import make_pretrain_step
from mofo_tpu.train.train_state import TrainState

ALL_KNOBS = {
    "MOFO_PATCHIFY": "lr",
    "MOFO_LN": "mmvjp",
    "MOFO_GELU": "tanh",
    "MOFO_POS": "arith",
}


def _run_two_steps():
    cfg = PretrainConfig(
        input_size=32,
        num_frames=4,
        batch_size=4,
        masking=MaskingConfig(mask_type="tube_bb"),
        motion_loss_weight=True,
    )
    model = create_model(
        "pretrain_videomae_base_patch16_224",
        img_size=32,
        num_frames=4,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        decoder_embed_dim=16,
        decoder_depth=1,
        decoder_num_heads=2,
        decoder_num_classes=1536,
        dtype=jnp.bfloat16,
    )
    B = 4
    clip = jax.random.normal(
        jax.random.PRNGKey(0), (B, 4, 32, 32, 3), jnp.float32
    )
    bk1, bk2 = jax.random.split(jax.random.PRNGKey(3))
    xy1 = jax.random.uniform(bk1, (B, 4, 2), minval=0.0, maxval=12.0)
    wh = jax.random.uniform(bk2, (B, 4, 2), minval=8.0, maxval=16.0)
    boxes = jnp.concatenate([xy1, xy1 + wh], axis=-1)
    vis0 = jnp.zeros((B, cfg.num_tokens - cfg.num_masked), jnp.int32)
    msk0 = jnp.zeros((B, cfg.num_masked), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), clip, vis0, msk0)["params"]
    lr = schedules.cosine_schedule(1.5e-4, 1e-5, 800, 100, 40)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
    batch = {"clip": clip, "boxes": boxes}
    rng = jax.random.PRNGKey(2)
    for _ in range(2):
        state, metrics = step(state, batch, rng, 0.5)
    return float(metrics["loss"])


class TestKnobCombo:
    def test_all_knobs_compose(self, monkeypatch):
        base = _run_two_steps()
        assert np.isfinite(base)
        for k, v in ALL_KNOBS.items():
            monkeypatch.setenv(k, v)
        combo = _run_two_steps()
        assert np.isfinite(combo)
        # Every knob is a reformulation of the same math; the only
        # sanctioned deviation is tanh-GELU (<=5e-4 elementwise) plus
        # bf16 rounding differences in the reassociated reductions.
        assert abs(combo - base) < 5e-3, (base, combo)

    @pytest.mark.parametrize("knob,value", sorted(ALL_KNOBS.items()))
    def test_each_knob_alone(self, monkeypatch, knob, value):
        monkeypatch.setenv(knob, value)
        assert np.isfinite(_run_two_steps())
