"""EK dataset, dynamic loss scaling, wandb no-op, driver entry points."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofo_tpu.data.epic import EpicClipDataset
from mofo_tpu.data.filelist import EpicEntry
from mofo_tpu.train.loss_scale import DynamicLossScale, apply_if_finite
from mofo_tpu.train.wandb_compat import WandbLogger


@pytest.fixture(scope="module")
def epic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ek")
    for split in ("train", "validation"):
        os.makedirs(root / split, exist_ok=True)
        for i in range(2):
            path = str(root / split / f"video_{i}.mp4")
            w = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
            )
            for f in range(30):
                w.write(np.full((48, 64, 3), (f * 7) % 255, np.uint8))
            w.release()
    return str(root)


def _entries():
    return [
        EpicEntry("P01", "P01_01", "take plate", 2, 7,
                  "00:00:00.00", "00:00:02.00", 0),
        EpicEntry("P01", "P01_01", "open door", 3, 1,
                  "00:00:02.00", "00:00:04.00", 1),
    ]


class TestEpicDataset:
    def test_modes_and_labels(self, epic_root):
        mapping = {"2:7": 0, "3:1": 1}
        for mode, expect_len in (("train", 2), ("validation", 2),
                                 ("test", 2 * 2 * 3)):
            ds = EpicClipDataset(
                entries=_entries(),
                video_root=epic_root,
                split="train",
                mode=mode,
                classtype="action",
                action_mapping=mapping,
                num_frames=8,
                decode_size=(48, 64),
            )
            assert len(ds) == expect_len
            item = ds[0]
            assert item["clip"].shape == (8, 48, 64, 3)
            assert int(item["label"]) == 0

    def test_verb_noun_labels(self, epic_root):
        for classtype, expect in (("verb", 2), ("noun", 7)):
            ds = EpicClipDataset(
                entries=_entries(), video_root=epic_root, split="train",
                mode="train", classtype=classtype, num_frames=4,
                decode_size=(48, 64),
            )
            assert int(ds[0]["label"]) == expect

    def test_action_requires_mapping(self, epic_root):
        with pytest.raises(ValueError):
            EpicClipDataset(
                entries=_entries(), video_root=epic_root, split="train",
                mode="train", classtype="action",
            )


class TestDynamicLossScale:
    def test_scales_and_unscales(self):
        dls = DynamicLossScale.create(initial_scale_power=3)  # scale 8
        loss_fn = lambda w: jnp.sum(w**2)
        w = jnp.asarray([1.0, 2.0])
        loss, grads, finite = dls.value_and_grad(loss_fn)(w)
        assert abs(float(loss) - 5.0) < 1e-6
        np.testing.assert_allclose(np.asarray(grads), [2.0, 4.0],
                                   atol=1e-6)
        assert bool(finite)

    def test_backoff_on_nonfinite(self):
        dls = DynamicLossScale.create(initial_scale_power=3)
        updated = dls.update(jnp.asarray(False))
        assert float(updated.scale) == 4.0
        assert int(updated.good_steps) == 0

    def test_growth_after_window(self):
        dls = DynamicLossScale.create(initial_scale_power=3,
                                      growth_interval=2)
        d1 = dls.update(jnp.asarray(True))
        assert float(d1.scale) == 8.0  # not yet
        d2 = d1.update(jnp.asarray(True))
        assert float(d2.scale) == 16.0  # grew after 2 good steps

    def test_apply_if_finite(self):
        new = {"w": jnp.asarray([1.0])}
        old = {"w": jnp.asarray([0.0])}
        kept = apply_if_finite(new, old, jnp.asarray(False))
        assert float(kept["w"][0]) == 0.0


class TestWandbNoOp:
    def test_disabled_without_project(self):
        w = WandbLogger(project=None)
        w.log({"loss": 1.0})
        w.finish()  # no exception

    def test_graceful_without_package(self):
        w = WandbLogger(project="proj")  # wandb not installed here
        w.log({"loss": 1.0})
        w.finish()


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # conftest already forces 8 CPU devices


class TestGeluOption:
    def test_tanh_gelu_deviation_bound(self):
        """bf16 Mlp uses tanh GELU (the measured −10.4 ms/step default;
        docs/ab_r4.jsonl) — a documented non-parity fast path whose
        deviation from exact (erf) GELU must stay under 5e-4 absolute
        across the realistic activation range. f32 (the bit-parity
        path) keeps exact erf."""
        import flax.linen as nn

        x = jnp.linspace(-12.0, 12.0, 200001, dtype=jnp.float32)
        a = nn.gelu(x, approximate=False)
        b = nn.gelu(x, approximate=True)
        assert float(jnp.max(jnp.abs(a - b))) < 5e-4

    def test_dtype_selects_gelu_form(self):
        """f32 Mlp == exact-erf reference bit-for-bit; bf16 Mlp == the
        tanh form (not erf) on the same weights."""
        import flax.linen as nn

        from mofo_tpu.models.layers import Mlp

        rng = np.random.RandomState(0)
        xf = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
        mlp32 = Mlp(hidden_features=32, out_features=16, dtype=jnp.float32)
        p = mlp32.init(jax.random.PRNGKey(0), xf)

        def manual(x, params, dtype, approximate):
            h = x.astype(dtype) @ params["fc1"]["kernel"].astype(dtype) \
                + params["fc1"]["bias"].astype(dtype)
            if dtype == jnp.bfloat16:
                h = nn.gelu(
                    h.astype(jnp.float32), approximate=approximate
                ).astype(dtype)
            else:
                h = nn.gelu(h, approximate=approximate)
            return h @ params["fc2"]["kernel"].astype(dtype) \
                + params["fc2"]["bias"].astype(dtype)

        got32 = mlp32.apply(p, xf)
        np.testing.assert_array_equal(
            np.asarray(got32),
            np.asarray(manual(xf, p["params"], jnp.float32, False)),
        )
        mlp16 = Mlp(hidden_features=32, out_features=16,
                    dtype=jnp.bfloat16)
        got16 = np.asarray(
            mlp16.apply(p, xf.astype(jnp.bfloat16)), np.float32
        )
        want_tanh = np.asarray(
            manual(xf, p["params"], jnp.bfloat16, True), np.float32
        )
        want_erf = np.asarray(
            manual(xf, p["params"], jnp.bfloat16, False), np.float32
        )
        np.testing.assert_array_equal(got16, want_tanh)
        assert (got16 != want_erf).any()


class TestBenchBackendRetry:
    """bench.py must survive a transient relay flap (VERDICT r03: two
    capture windows in a row were lost to UNAVAILABLE backend init)."""

    def test_recovers_after_one_flap(self):
        import bench

        calls = {"n": 0}

        def flaky_probe():
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError(
                    "Unable to initialize backend 'axon': UNAVAILABLE"
                )
            return 1.0

        bench.init_backend_with_retry(
            attempts=3, backoff_s=0.0, probe=flaky_probe
        )
        assert calls["n"] == 2

    def test_structured_error_on_outage(self, capsys):
        import json

        import bench

        def dead_probe():
            raise RuntimeError("UNAVAILABLE: TPU backend setup error")

        with pytest.raises(SystemExit) as exc:
            bench.init_backend_with_retry(
                attempts=2, backoff_s=0.0, probe=dead_probe
            )
        assert exc.value.code == 1
        line = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec["error"] == "backend_unavailable"
        assert rec["vs_baseline"] == 0.0
        assert "UNAVAILABLE" in rec["extra"]["last_error"]


class TestFp16FlashUpcast:
    """Mosaic has no f16 type, but fp16 (--dtype float16, the
    DeepSpeed-parity config) is the reference's production finetune
    mode — f16 operands are upcast to bf16 at the flash-kernel boundary
    (flash_attention._f16_boundary) instead of falling back to the N^2
    XLA path, keeping fp16 first-class perf-wise (VERDICT r4 #8)."""

    def test_f16_attention_runs_flash_and_matches_xla(self, monkeypatch):
        from mofo_tpu.models import layers as L
        from mofo_tpu.ops import attention as A

        monkeypatch.setattr(A, "_on_tpu", lambda: True)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 256, 128), jnp.float16
        )
        attn = L.Attention(
            dim=128, num_heads=2, qkv_bias=True, dtype=jnp.float16,
            attn_impl="auto",
        )
        p = attn.init(jax.random.PRNGKey(0), x)
        out = attn.apply(p, x)  # flash path (interpreted off-TPU)
        assert out.dtype == jnp.float16
        assert np.isfinite(np.asarray(out, np.float32)).all()
        xla_attn = L.Attention(
            dim=128, num_heads=2, qkv_bias=True, dtype=jnp.float16,
            attn_impl="xla",
        )
        ref = xla_attn.apply(p, x)
        # bf16 vs f16 operand quantization: agreement to bf16 epsilon
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_f16_grads_finite_and_f16(self):
        from mofo_tpu.ops.flash_attention import flash_attention_mh

        q = jnp.asarray(
            np.random.RandomState(1).randn(2, 64, 128) * 0.1, jnp.float16
        )

        def loss(q):
            o = flash_attention_mh(
                q, q, q, scale=0.125, num_heads=2, interpret=True
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(q)
        assert g.dtype == jnp.float16
        assert np.isfinite(np.asarray(g, np.float32)).all()

    def test_explicit_pallas_f16_upcasts(self):
        from mofo_tpu.ops.attention import dot_product_attention

        rs = np.random.RandomState(2)
        q = jnp.asarray(rs.randn(1, 2, 256, 64) * 0.1, jnp.float16)
        out = dot_product_attention(q, q, q, scale=0.125, impl="pallas")
        ref = dot_product_attention(q, q, q, scale=0.125, impl="xla")
        assert out.dtype == jnp.float16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )