"""End-to-end pretrain step: overfit-one-batch, grad accumulation, EMA,
and the multi-device (8 virtual CPU) sharded path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.core.config import MaskingConfig, PretrainConfig
from mofo_tpu.models import create_model
from mofo_tpu.parallel import mesh as mesh_lib
from mofo_tpu.train import optim, schedules
from mofo_tpu.train.pretrain_step import make_pretrain_step
from mofo_tpu.train.train_state import TrainState


def tiny_cfg(**kw):
    cfg = PretrainConfig(
        input_size=32,
        num_frames=4,
        batch_size=4,
        masking=MaskingConfig(mask_ratio=0.5),
    )
    return dataclasses.replace(cfg, **kw)


def tiny_model():
    return create_model(
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
    )


def init_state(model, cfg, tx, use_ema=False, B=4):
    clip = jnp.zeros((B, cfg.num_frames, cfg.input_size, cfg.input_size, 3))
    n_masked = cfg.num_masked
    vis = jnp.zeros((B, cfg.num_tokens - n_masked), jnp.int32)
    msk = jnp.zeros((B, n_masked), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), clip, vis, msk)["params"]
    return TrainState.create(params, tx, use_ema=use_ema)


class TestPretrainStep:
    def test_overfit_one_batch(self):
        cfg = tiny_cfg()
        model = tiny_model()
        n_steps = 80
        lr = schedules.cosine_schedule(3e-3, 1e-4, 8, 10, 1)
        tx = optim.create_optimizer(
            init_state(model, cfg, __import__("optax").adam(0.0)).params,
            lr_schedule=lr,
            betas=(0.9, 0.95),
            weight_decay=0.05,
        )
        state = init_state(model, cfg, tx)
        step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
        # structured (learnable) clip: smooth spatial gradient + per-frame
        # offset, so masked patches are predictable from visible context
        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        base = np.repeat(((yy + xx) / 64.0)[:, :, None], 3, axis=-1)
        clip = np.stack(
            [base + 0.1 * t for t in range(4)], axis=0
        )[None].repeat(4, axis=0).astype(np.float32)
        batch = {"clip": jnp.asarray(clip)}
        rng = jax.random.PRNGKey(2)
        losses = []
        for _ in range(n_steps):
            state, metrics = step(state, batch, rng, 0.0)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
        assert int(state.step) == n_steps
        assert np.isfinite(losses).all()
        assert "lr" in metrics and "grad_norm" in metrics

    def test_grad_accumulation_runs(self):
        cfg = tiny_cfg(update_freq=2)
        model = tiny_model()
        lr = schedules.cosine_schedule(1e-3, 1e-4, 10, 10, 1)
        tx = optim.create_optimizer(
            init_state(model, cfg, __import__("optax").adam(0.0)).params,
            lr_schedule=lr,
        )
        state = init_state(model, cfg, tx)
        step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
        batch = {
            "clip": jax.random.normal(
                jax.random.PRNGKey(1), (4, 4, 32, 32, 3)
            )
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(2), 0.0)
        assert np.isfinite(float(metrics["loss"]))

    def test_adahessian_second_order_step(self):
        """adahessian end to end: the step computes the Hutchinson probe
        (jvp of grad — the reference's create_graph=True second backward,
        engine_for_pretraining.py:173) and feeds it as the optimizer's
        hessian_diag extra arg. Covers both the plain and the
        grad-accumulation (scan) paths."""
        model = tiny_model()
        # flat schedule: a warmup schedule's first step is lr=0, which
        # would make the first update a no-op
        lr = np.full(8, 1e-3, np.float32)
        for freq in (1, 2):
            cfg = tiny_cfg(update_freq=freq)
            tx = optim.create_optimizer(
                init_state(model, cfg, __import__("optax").adam(0.0)).params,
                lr_schedule=lr, opt="adahessian",
            )
            assert optim.is_second_order("adahessian")
            state = init_state(model, cfg, tx)
            step = jax.jit(
                make_pretrain_step(model, tx, cfg, lr, second_order=True)
            )
            batch = {
                "clip": jax.random.normal(
                    jax.random.PRNGKey(1), (4, 4, 32, 32, 3)
                )
            }
            p0 = state.params
            for _ in range(2):
                state, metrics = step(state, batch, jax.random.PRNGKey(2), 0.0)
                assert np.isfinite(float(metrics["loss"])), freq
            # bitwise: adahessian updates g/|h| can be tiny where the
            # curvature estimate is large, but never exactly zero
            moved = jax.tree.map(
                lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
                p0, state.params,
            )
            assert all(jax.tree.leaves(moved)), freq

    def test_motion_masking_and_weighted_loss(self):
        cfg = tiny_cfg()
        cfg = dataclasses.replace(
            cfg,
            masking=MaskingConfig(mask_type="tube_bb", mask_ratio=0.5),
            motion_loss_weight=True,
        )
        model = tiny_model()
        lr = schedules.cosine_schedule(1e-3, 1e-4, 10, 10, 1)
        tx = optim.create_optimizer(
            init_state(model, cfg, __import__("optax").adam(0.0)).params,
            lr_schedule=lr,
        )
        state = init_state(model, cfg, tx)
        step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
        batch = {
            "clip": jax.random.normal(
                jax.random.PRNGKey(1), (4, 4, 32, 32, 3)
            ),
            "boxes": jnp.tile(
                jnp.array([4.0, 4.0, 24.0, 24.0]), (4, 4, 1)
            ),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(2), 0.5)
        assert np.isfinite(float(metrics["loss"]))

    def test_ema_updates(self):
        cfg = tiny_cfg()
        model = tiny_model()
        # no warmup: the first step must actually move params
        lr = schedules.cosine_schedule(1e-2, 1e-3, 10, 10)
        tx = optim.create_optimizer(
            init_state(model, cfg, __import__("optax").adam(0.0)).params,
            lr_schedule=lr,
        )
        state = init_state(model, cfg, tx, use_ema=True)
        ema_before = jax.tree.map(np.asarray, state.ema_params)
        step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
        batch = {
            "clip": jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
        }
        for _ in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(2), 0.0)
        diff = sum(
            float(np.abs(b - np.asarray(a)).max())
            for b, a in zip(
                jax.tree.leaves(ema_before), jax.tree.leaves(state.ema_params)
            )
        )
        assert diff > 0.0
        # EMA lags params: it must differ from the live params too
        lag = sum(
            float(np.abs(np.asarray(e) - np.asarray(p)).max())
            for e, p in zip(
                jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params)
            )
        )
        assert lag > 0.0


class TestMultiDevice:
    def test_sharded_step_on_8_devices(self):
        assert jax.device_count() == 8
        cfg = tiny_cfg(batch_size=1)  # global batch 8
        model = tiny_model()
        lr = schedules.cosine_schedule(1e-3, 1e-4, 10, 10, 1)
        mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=4, fsdp=1,
                                                       model=2))
        tx = optim.create_optimizer(
            init_state(model, cfg, __import__("optax").adam(0.0)).params,
            lr_schedule=lr,
        )
        state = init_state(model, cfg, tx, B=8)
        state = state.replace(
            params=mesh_lib.shard_params(state.params, mesh),
            opt_state=jax.tree.map(
                lambda x: x, state.opt_state
            ),
        )
        batch = {
            "clip": jax.device_put(
                jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32, 32, 3)),
                mesh_lib.batch_sharding(mesh),
            )
        }
        step = jax.jit(make_pretrain_step(model, tx, cfg, lr))
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(2), 0.0)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # params remain consistent: loss decreases over repeated steps on
        # the same batch
        assert losses[-1] < losses[0]

    def test_sharded_matches_replicated(self):
        """The one property that validates the TP/FSDP specs: the same
        step on a (2,2,2) mesh must produce the same loss and updated
        params as the unsharded single-device run (up to collective
        reassociation)."""
        assert jax.device_count() == 8
        cfg = tiny_cfg(batch_size=8)
        model = tiny_model()
        lr = schedules.cosine_schedule(1e-3, 1e-4, 10, 10, 1)
        tx = optim.create_optimizer(
            init_state(model, cfg, __import__("optax").adam(0.0)).params,
            lr_schedule=lr,
        )
        clip = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32, 32, 3))
        rng = jax.random.PRNGKey(2)
        step = jax.jit(make_pretrain_step(model, tx, cfg, lr))

        def run(state, batch, n=2):
            losses = []
            for _ in range(n):
                state, metrics = step(state, batch, rng, 0.0)
                losses.append(float(metrics["loss"]))
            return state, losses

        # replicated single-device reference
        dev0 = jax.devices()[0]
        state_r = jax.device_put(init_state(model, cfg, tx, B=8), dev0)
        state_r, losses_r = run(state_r, {"clip": jax.device_put(clip, dev0)})

        # sharded: dp=2 x fsdp=2 x tp=2
        mesh = mesh_lib.build_mesh(
            mesh_lib.MeshConfig(data=2, fsdp=2, model=2)
        )
        state_s = init_state(model, cfg, tx, B=8)
        state_s = state_s.replace(
            params=mesh_lib.shard_params(state_s.params, mesh)
        )
        batch_s = {
            "clip": jax.device_put(clip, mesh_lib.batch_sharding(mesh))
        }
        state_s, losses_s = run(state_s, batch_s)

        np.testing.assert_allclose(losses_s, losses_r, rtol=2e-5)
        flat_r = jax.tree_util.tree_leaves_with_path(state_r.params)
        flat_s = jax.tree.leaves(state_s.params)
        for (path, pr), ps in zip(flat_r, flat_s):
            np.testing.assert_allclose(
                np.asarray(ps), np.asarray(pr), rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_mesh_resolve(self):
        c = mesh_lib.MeshConfig(data=-1, fsdp=2, model=2)
        assert c.resolve(8) == (2, 2, 2)
        m = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=8))
        assert m.shape == {"data": 8, "fsdp": 1, "model": 1}
