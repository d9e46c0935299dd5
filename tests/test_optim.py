"""Optimizer/schedule parity vs the reference implementation semantics.

The AdamW test reproduces the reference training-loop mechanics in torch
(param groups with lr_scale, per-step lr/wd mutation as in
engine_for_pretraining.py:30-37) and checks our optax chain tracks it
bit-for-bit over many steps.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mofo_tpu.train import optim, schedules


class TestCosineSchedule:
    def test_matches_reference_formula(self):
        # direct transcription of utils.py:391-408
        base, final, epochs, niter, warm = 1.5e-4, 1e-5, 10, 7, 2
        warmup_iters = warm * niter
        warmup = np.linspace(0, base, warmup_iters)
        iters = np.arange(epochs * niter - warmup_iters)
        main = np.array(
            [
                final
                + 0.5 * (base - final) * (1 + math.cos(math.pi * i / len(iters)))
                for i in iters
            ]
        )
        ref = np.concatenate([warmup, main])
        ours = schedules.cosine_schedule(base, final, epochs, niter, warm)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_no_warmup(self):
        s = schedules.cosine_schedule(1.0, 0.1, 4, 5)
        assert len(s) == 20 and abs(s[0] - 1.0) < 1e-6

    def test_warmup_steps_override(self):
        s = schedules.cosine_schedule(1.0, 0.0, 4, 5, warmup_epochs=1,
                                      warmup_steps=3)
        assert len(s) == 20
        np.testing.assert_allclose(s[:3], np.linspace(0, 1.0, 3), rtol=1e-6)

    def test_scaled_lr(self):
        assert abs(schedules.scaled_lr(1.5e-4, 2048) - 1.2e-3) < 1e-9


class TestParamLabels:
    def _params(self):
        return {
            "patch_embed": {"kernel": jnp.ones((8, 4)),
                            "bias": jnp.ones((4,))},
            "blocks_0": {"attn": {"qkv_kernel": jnp.ones((4, 12)),
                                  "q_bias": jnp.ones((4,))}},
            "blocks_3": {"mlp": {"fc1": {"kernel": jnp.ones((4, 16))}}},
            "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.ones((2,))},
            "mask_token": jnp.ones((1, 1, 4)),
        }

    def test_decay_mask(self):
        mask = optim.decay_mask(self._params())
        assert mask["patch_embed"]["kernel"] is True
        assert mask["patch_embed"]["bias"] is False
        assert mask["blocks_0"]["attn"]["q_bias"] is False
        assert mask["head"]["kernel"] is True
        assert mask["mask_token"] is False  # 3-D but in no-decay set

    def test_layer_ids(self):
        depth = 12
        num_layers = depth + 2
        ids = jax.tree_util.tree_map_with_path(
            lambda p, _: optim.layer_id_for_path(p, num_layers),
            self._params(),
        )
        assert ids["patch_embed"]["kernel"] == 0
        assert ids["blocks_0"]["attn"]["qkv_kernel"] == 1
        assert ids["blocks_3"]["mlp"]["fc1"]["kernel"] == 4
        assert ids["head"]["kernel"] == num_layers - 1
        assert ids["mask_token"] == 0

    def test_backbone_prefix(self):
        class FakeKey:
            def __init__(self, key):
                self.key = key

        path = (FakeKey("backbone"), FakeKey("blocks_5"), FakeKey("kernel"))
        assert optim.layer_id_for_path(path, 14) == 6


class TestAdamWParityVsTorch:
    def test_tracks_torch_adamw_with_layer_decay_and_schedules(self):
        steps, depth, layer_decay = 25, 2, 0.75
        rng = np.random.RandomState(0)
        w0 = rng.randn(4, 3).astype(np.float32)  # blocks_0 kernel (decay)
        w1 = rng.randn(4, 3).astype(np.float32)  # head kernel (decay)
        b0 = rng.randn(3).astype(np.float32)  # bias (no decay)
        grads_seq = [
            {
                "blocks_0": {"kernel": rng.randn(4, 3).astype(np.float32)},
                "head": {"kernel": rng.randn(4, 3).astype(np.float32),
                         "bias": rng.randn(3).astype(np.float32)},
            }
            for _ in range(steps)
        ]
        lr_sched = schedules.cosine_schedule(1e-3, 1e-5, 5, 5, 1)
        wd_sched = schedules.cosine_schedule(0.05, 0.02, 5, 5)

        # --- torch side: reference engine mechanics ---
        tp = {
            "w0": torch.tensor(w0, requires_grad=True),
            "w1": torch.tensor(w1, requires_grad=True),
            "b0": torch.tensor(b0, requires_grad=True),
        }
        num_layers = depth + 2
        values = [layer_decay ** (depth + 1 - i) for i in range(num_layers)]
        groups = [
            {"params": [tp["w0"]], "weight_decay": 0.05,
             "lr_scale": values[1]},  # blocks_0 -> layer 1
            {"params": [tp["w1"]], "weight_decay": 0.05,
             "lr_scale": values[num_layers - 1]},  # head -> last
            {"params": [tp["b0"]], "weight_decay": 0.0,
             "lr_scale": values[num_layers - 1]},
        ]
        topt = torch.optim.AdamW(groups, lr=1.0, betas=(0.9, 0.95),
                                 eps=1e-8)
        for it in range(steps):
            for g in topt.param_groups:
                g["lr"] = float(lr_sched[it]) * g["lr_scale"]
                if g["weight_decay"] > 0:
                    g["weight_decay"] = float(wd_sched[it])
            tp["w0"].grad = torch.tensor(grads_seq[it]["blocks_0"]["kernel"])
            tp["w1"].grad = torch.tensor(grads_seq[it]["head"]["kernel"])
            tp["b0"].grad = torch.tensor(grads_seq[it]["head"]["bias"])
            topt.step()

        # --- our side ---
        params = {
            "blocks_0": {"kernel": jnp.asarray(w0)},
            "head": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b0)},
        }
        tx = optim.create_optimizer(
            params,
            lr_schedule=lr_sched,
            wd_schedule=wd_sched,
            betas=(0.9, 0.95),
            layer_decay=layer_decay,
            depth=depth,
        )
        import optax

        opt_state = tx.init(params)
        for it in range(steps):
            g = {
                "blocks_0": {"kernel": jnp.asarray(
                    grads_seq[it]["blocks_0"]["kernel"])},
                "head": {"kernel": jnp.asarray(grads_seq[it]["head"]["kernel"]),
                         "bias": jnp.asarray(grads_seq[it]["head"]["bias"])},
            }
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params["blocks_0"]["kernel"]),
            tp["w0"].detach().numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(params["head"]["kernel"]),
            tp["w1"].detach().numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(params["head"]["bias"]),
            tp["b0"].detach().numpy(), atol=1e-6)

    def test_clip_grad(self):
        params = {"w": jnp.ones((3,)) * 0.0}
        tx = optim.create_optimizer(
            params, lr_schedule=np.array([1.0]), weight_decay=0.0,
            clip_grad=0.1,
        )
        st = tx.init(params)
        big = {"w": jnp.ones((3,)) * 100.0}
        upd, _ = tx.update(big, st, params)
        # after clip, adam normalizes to ~unit scale; just assert finite
        assert np.isfinite(np.asarray(upd["w"])).all()

    def test_global_norm(self):
        tree = {"a": jnp.asarray([3.0]), "b": jnp.asarray([4.0])}
        assert abs(float(optim.global_norm(tree)) - 5.0) < 1e-6


class TestZoo:
    def test_every_zoo_name_steps(self):
        """One update step per optimizer name: finite updates, params
        move. Mirrors the reference timm factory surface
        (optim_factory.py create_optimizer)."""
        import optax

        names = [
            "adamw", "adam", "sgd", "nesterov", "momentum", "lamb",
            "adafactor", "rmsprop", "adadelta", "lars", "lion", "nadam",
            "radam", "novograd", "adamax", "adagrad", "adabelief",
            "yogi", "fusedadam", "fusedadamw", "fusedsgd", "fusedlamb",
            "fusednovograd", "nvnovograd", "fusedmomentum",
            "adamp", "sgdp", "lookahead_adamw", "lookahead_sgd",
        ]
        params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
        g = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
        for name in names:
            tx = optim.create_optimizer(
                params, lr_schedule=np.array([0.1] * 4), opt=name,
                weight_decay=0.01,
            )
            st = tx.init(params)
            upd, st = tx.update(g, st, params)
            new = optax.apply_updates(params, upd)
            leaves = jax.tree.leaves(new)
            assert all(np.isfinite(np.asarray(x)).all() for x in leaves), name
            assert not np.allclose(np.asarray(new["w"]), 1.0), name

    def test_unknown_name_raises(self):
        import pytest

        params = {"w": jnp.ones((2,))}
        with pytest.raises(ValueError, match="Unknown optimizer"):
            optim.create_optimizer(
                params, lr_schedule=np.array([0.1]), opt="shampoo"
            )


class TestFreeze:
    def test_trainable_mask_freezes_params(self):
        import optax

        params = {"backbone": {"w": jnp.ones((3,))},
                  "head": {"w": jnp.ones((3,))}}
        from mofo_tpu.train.optim import path_names

        tx = optim.create_optimizer(
            params,
            lr_schedule=np.array([0.1] * 10),
            weight_decay=0.0,
            trainable=lambda path, leaf: "head" in path_names(path),
        )
        st = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        upd, st = tx.update(g, st, params)
        new = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(new["backbone"]["w"]), 1.0)  # frozen
        assert not np.allclose(np.asarray(new["head"]["w"]), 1.0)

    def test_frozen_params_have_no_adam_moments(self):
        params = {"backbone": {"w": jnp.ones((3,))},
                  "head": {"w": jnp.ones((3,))}}
        from mofo_tpu.train.optim import path_names

        tx = optim.create_optimizer(
            params,
            lr_schedule=np.array([0.1] * 10),
            weight_decay=0.0,
            trainable=lambda path, leaf: "head" in path_names(path),
        )
        st = tx.init(params)
        # optax.masked stores MaskedNode (no arrays) for frozen leaves:
        # total optimizer-state array elements < a full two-moment Adam
        n_elems = sum(
            x.size for x in jax.tree.leaves(st)
            if hasattr(x, "size")
        )
        n_params = sum(x.size for x in jax.tree.leaves(params))
        assert n_elems < 2 * n_params, (n_elems, n_params)

    def test_empty_trainable_mask_raises(self):
        import pytest

        params = {"backbone": {"w": jnp.ones((3,))}}
        with pytest.raises(ValueError, match="no parameters"):
            optim.create_optimizer(
                params,
                lr_schedule=np.array([0.1] * 10),
                trainable=lambda path, leaf: False,
            )


class TestAdamP:
    """adamp/sgdp vs a numpy transcription of the published AdamP
    algorithm (Heo et al. 2021; timm adamp.py — the reference zoo's
    'adamp'/'sgdp' entries, optim_factory.py:109-117)."""

    @staticmethod
    def _adamp_ref(p0, grads, lr, wd, b1=0.9, b2=0.999, eps=1e-8,
                   delta=0.1, wd_ratio=0.1):
        p = p0.astype(np.float64).copy()
        mu = np.zeros_like(p)
        nu = np.zeros_like(p)
        for t, g in enumerate(grads, 1):
            g = g.astype(np.float64)
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * g * g
            perturb = (mu / (1 - b1**t)) / (np.sqrt(nu / (1 - b2**t)) + eps)
            ratio = 1.0
            if p.ndim >= 2:
                for channel in (True, False):
                    shape = (p.shape[0], -1) if channel else (1, -1)
                    pm = p.reshape(shape)
                    gm = g.reshape(shape)
                    cos = np.abs((gm * pm).sum(1)) / (
                        np.linalg.norm(gm, axis=1)
                        * np.linalg.norm(pm, axis=1) + eps
                    )
                    if cos.max() < delta / np.sqrt(pm.shape[1]):
                        un = pm / (
                            np.linalg.norm(pm, axis=1, keepdims=True) + eps
                        )
                        um = perturb.reshape(shape)
                        perturb = (
                            um - un * (un * um).sum(1, keepdims=True)
                        ).reshape(p.shape)
                        ratio = wd_ratio
                        break
            p = p * (1 - lr * wd * ratio) - lr * perturb
        return p

    def test_matches_numpy_reference(self):
        import optax

        rng = np.random.RandomState(0)
        # w_inv: scale-invariant-looking leaf (grads ~ orthogonal to p);
        # w_reg: strongly radial grads (projection must NOT trigger)
        p0 = {"w_inv": rng.randn(4, 8).astype(np.float32),
              "w_reg": rng.randn(4, 8).astype(np.float32)}
        grads = []
        for _ in range(5):
            g_inv = rng.randn(4, 8).astype(np.float32)
            pm = p0["w_inv"]
            g_inv -= pm * (g_inv * pm).sum() / (pm * pm).sum()  # de-radialize
            grads.append({"w_inv": g_inv, "w_reg": 3.0 * p0["w_reg"]})

        lr, wd = 0.01, 0.05
        tx = optim.create_optimizer(
            jax.tree.map(jnp.asarray, p0),
            lr_schedule=np.array([lr] * 8), opt="adamp", weight_decay=wd,
        )
        params = jax.tree.map(jnp.asarray, p0)
        st = tx.init(params)
        for g in grads:
            upd, st = tx.update(jax.tree.map(jnp.asarray, g), st, params)
            params = optax.apply_updates(params, upd)

        for key in p0:
            ref = self._adamp_ref(
                p0[key], [g[key] for g in grads], lr, wd
            )
            np.testing.assert_allclose(
                np.asarray(params[key]), ref, rtol=2e-5, atol=2e-6,
                err_msg=key,
            )

    def test_projection_triggers_only_when_scale_invariant(self):
        # orthogonal grad + projected update stays orthogonal to p rows
        rng = np.random.RandomState(1)
        p = jnp.asarray(rng.randn(3, 16).astype(np.float32))
        g = rng.randn(3, 16).astype(np.float32)
        gn = g - np.asarray(p) * (g * np.asarray(p)).sum(
            1, keepdims=True
        ) / (np.asarray(p) ** 2).sum(1, keepdims=True)
        out, ratio = optim._adamp_project(
            p, jnp.asarray(gn), jnp.asarray(gn), 0.1, 0.1, 1e-8
        )
        assert abs(float(ratio) - 0.1) < 1e-6
        dots = np.abs((np.asarray(out) * np.asarray(p)).sum(1))
        assert (dots < 1e-4).all()
        # radial grad: untouched
        out2, ratio2 = optim._adamp_project(
            p, 2.0 * p, 2.0 * p, 0.1, 0.1, 1e-8
        )
        assert float(ratio2) == 1.0
        np.testing.assert_allclose(np.asarray(out2), 2.0 * np.asarray(p))

    def test_sgdp_steps_and_projects(self):
        import optax

        params = {"w": jnp.ones((4, 4)) / 4.0}
        tx = optim.create_optimizer(
            params, lr_schedule=np.array([0.1] * 4), opt="sgdp",
            weight_decay=0.01,
        )
        st = tx.init(params)
        g = {"w": jnp.full((4, 4), 0.5)}
        upd, st = tx.update(g, st, params)
        new = optax.apply_updates(params, upd)
        assert np.isfinite(np.asarray(new["w"])).all()
        assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))


class TestLookahead:
    def test_matches_numpy_twin(self):
        import optax

        k, alpha, lr = 3, 0.5, 0.1
        tx = optax.chain(optax.scale(-lr), optim.lookahead(k=k, alpha=alpha))
        p0 = np.arange(6, dtype=np.float32).reshape(2, 3) / 5.0
        params = {"w": jnp.asarray(p0)}
        st = tx.init(params)
        rng = np.random.RandomState(2)
        grads = [rng.randn(2, 3).astype(np.float32) for _ in range(8)]

        fast = p0.copy()
        slow = p0.copy()
        for t, g in enumerate(grads, 1):
            fast = fast - lr * g
            if t % k == 0:
                slow = slow + alpha * (fast - slow)
                fast = slow.copy()

        for g in grads:
            upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
            params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), fast, rtol=1e-6, atol=1e-7
        )


class TestAdamPFreeze:
    def test_adamp_sgdp_with_trainable_mask(self):
        """adamp/sgdp must compose with the freeze mask (optax.masked
        prunes trees to MaskedNode leaves, which their full-tree
        update_fns cannot map over — they use exact-zero freeze scaling
        instead). Frozen leaves must not move; trainable ones must."""
        import optax

        params = {"head": {"w": jnp.ones((4, 4))},
                  "body": {"w": jnp.ones((4, 4))}}
        g = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
        for opt in ("adamp", "sgdp"):
            tx = optim.create_optimizer(
                params, lr_schedule=np.array([0.1] * 4), opt=opt,
                weight_decay=0.01,
                trainable=lambda path, leaf: "head" in str(path),
            )
            st = tx.init(params)
            upd, st = tx.update(g, st, params)
            new = optax.apply_updates(params, upd)
            np.testing.assert_array_equal(
                np.asarray(new["body"]["w"]), np.asarray(params["body"]["w"]),
                err_msg=opt,
            )
            assert not np.allclose(
                np.asarray(new["head"]["w"]), np.asarray(params["head"]["w"])
            ), opt


class TestAdaHessian:
    """AdaHessian (reference zoo entry optim_factory.py:142-143, timm's
    Adahessian): Adam first moment on grads, second moment on the
    Hutchinson Hessian-diagonal estimate."""

    def test_matches_numpy_reference(self):
        import optax

        b1, b2, eps, lr, wd = 0.9, 0.999, 1e-8, 0.05, 0.02
        rng = np.random.RandomState(0)
        params = {"w": jnp.asarray(rng.randn(3, 4), jnp.float32),
                  "bias": jnp.asarray(rng.randn(4), jnp.float32)}
        tx = optim.create_optimizer(
            params, opt="adahessian", lr_schedule=np.full(8, lr),
            weight_decay=wd, betas=(b1, b2), eps=eps,
        )
        st = tx.init(params)
        p_np = {k: np.asarray(v, np.float64) for k, v in params.items()}
        mu = {k: np.zeros_like(v) for k, v in p_np.items()}
        nu = {k: np.zeros_like(v) for k, v in p_np.items()}
        p_jax = params
        for t in range(1, 6):
            g = {k: rng.randn(*v.shape).astype(np.float32)
                 for k, v in p_np.items()}
            h = {k: rng.randn(*v.shape).astype(np.float32)
                 for k, v in p_np.items()}
            upd, st = tx.update(
                jax.tree.map(jnp.asarray, g), st, p_jax,
                hessian_diag=jax.tree.map(jnp.asarray, h),
            )
            p_jax = optax.apply_updates(p_jax, upd)
            # numpy twin of timm's step: wd multiplies p (decoupled),
            # denom = (nu_hat)^(k/2) + eps with hessian_power k = 1
            bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
            for k in p_np:
                mu[k] = b1 * mu[k] + (1 - b1) * g[k]
                nu[k] = b2 * nu[k] + (1 - b2) * h[k] * h[k]
                denom = np.sqrt(nu[k] / bc2) + eps
                decay = wd if k == "w" else 0.0  # bias: no decay
                p_np[k] = (
                    p_np[k] * (1 - lr * decay)
                    - lr * (mu[k] / bc1) / denom
                )
        for k in p_np:
            np.testing.assert_allclose(
                np.asarray(p_jax[k]), p_np[k], rtol=2e-5, atol=2e-6,
                err_msg=k,
            )

    def test_hutchinson_exact_on_quadratic(self):
        """z ⊙ Hz is exact on quadratics for any Rademacher z:
        (Hz)_i = H_ii z_i when H is diagonal, and z_i^2 = 1."""
        a = {"w": jnp.arange(1.0, 13.0).reshape(3, 4),
             "b": jnp.arange(1.0, 5.0)}
        loss = lambda p: 0.5 * sum(
            jnp.sum(ai * pi ** 2)
            for ai, pi in zip(jax.tree.leaves(a), jax.tree.leaves(p))
        )
        params = jax.tree.map(jnp.ones_like, a)
        for seed in (0, 1, 7):
            hd = optim.hutchinson_diag(
                jax.grad(loss), params, jax.random.PRNGKey(seed)
            )
            for k in a:
                np.testing.assert_allclose(
                    np.asarray(hd[k]), np.asarray(a[k]), rtol=1e-6
                )

    def test_requires_hessian_diag(self):
        import pytest

        params = {"w": jnp.ones((2, 2))}
        tx = optim.create_optimizer(
            params, opt="adahessian", lr_schedule=np.array([0.1])
        )
        st = tx.init(params)
        with pytest.raises(ValueError, match="hessian_diag"):
            tx.update(jax.tree.map(jnp.ones_like, params), st, params)

    def test_is_second_order(self):
        assert optim.is_second_order("adahessian")
        assert optim.is_second_order("lookahead_adahessian")
        assert not optim.is_second_order("adamw")
        assert not optim.is_second_order("lookahead_adamw")

    def test_lookahead_adahessian_chain(self):
        """The lookahead wrapper (plain GradientTransformation) must
        compose with the extra-args chain: hessian_diag flows to
        scale_by_adahessian, lookahead ignores it."""
        import optax

        params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
        tx = optim.create_optimizer(
            params, opt="lookahead_adahessian",
            lr_schedule=np.full(16, 0.1), weight_decay=0.01,
        )
        st = tx.init(params)
        g = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
        h = jax.tree.map(lambda p: jnp.full_like(p, 2.0), params)
        p = params
        for _ in range(7):  # crosses the k=6 lookahead sync step
            upd, st = tx.update(g, st, p, hessian_diag=h)
            p = optax.apply_updates(p, upd)
        assert all(
            np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p)
        )
        assert not np.allclose(np.asarray(p["w"]), 1.0)


class TestInferDepth:
    """create_optimizer(layer_decay=...) infers block depth from the
    param tree — the explicit depth=12 default crashed ViT-L (blocks_23
    indexed past the 14-entry scale table, round-5 bench)."""

    def test_infer_depth_24(self):
        params = {
            "patch_embed": {"w": np.zeros(2)},
            **{f"blocks_{i}": {"w": np.zeros(2)} for i in range(24)},
            "head": {"w": np.zeros(2)},
        }
        assert optim.infer_depth(params) == 24

    def test_default_without_blocks(self):
        assert optim.infer_depth({"head": {"w": np.zeros(2)}}) == 12

    def test_layer_decay_vit_l_shape(self):
        """End-to-end: a 24-deep tree with layer_decay must build and
        scale blocks_23 by decay^1 and patch_embed by decay^25."""
        params = {
            "patch_embed": {"w": jnp.ones(2)},
            **{f"blocks_{i}": {"w": jnp.ones(2)} for i in range(24)},
        }
        lr = schedules.cosine_schedule(1.0, 1.0, 1, 2, 0)
        tx = optim.create_optimizer(
            params, lr_schedule=lr, layer_decay=0.75
        )
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        ratio = float(updates["blocks_23"]["w"][0]
                      / updates["blocks_0"]["w"][0])
        np.testing.assert_allclose(ratio, 0.75 ** -23, rtol=1e-5)
