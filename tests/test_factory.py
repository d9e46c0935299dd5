"""Offline factory: TV-L1 flow recovers known motion; motion-map math
matches the reference transcription; bbox extraction finds moving regions;
annot creators parse SSV2 labels."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofo_tpu.factory import annot, bbox, flow, motion_maps


def _shifted_pair(shift=(3, 0), H=64, W=64, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(H + 16, W + 16).astype(np.float32)
    # smooth the texture so flow has gradients to lock onto
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, 2.0) * 255
    a = base[8:8 + H, 8:8 + W]
    b = base[8 - shift[1]:8 - shift[1] + H, 8 - shift[0]:8 - shift[0] + W]
    return a, b


class TestTVL1:
    def test_recovers_horizontal_shift(self):
        a, b = _shifted_pair(shift=(3, 0))
        f = np.asarray(flow.tvl1_flow(jnp.asarray(a), jnp.asarray(b)))
        inner = f[16:-16, 16:-16]
        assert abs(np.median(inner[..., 0]) - 3.0) < 0.8, np.median(
            inner[..., 0])
        assert abs(np.median(inner[..., 1])) < 0.6

    def test_recovers_vertical_shift(self):
        a, b = _shifted_pair(shift=(0, 2), seed=1)
        f = np.asarray(flow.tvl1_flow(jnp.asarray(a), jnp.asarray(b)))
        inner = f[16:-16, 16:-16]
        assert abs(np.median(inner[..., 1]) - 2.0) < 0.8
        assert abs(np.median(inner[..., 0])) < 0.6

    def test_zero_motion(self):
        a, _ = _shifted_pair()
        f = np.asarray(flow.tvl1_flow(jnp.asarray(a), jnp.asarray(a)))
        assert np.abs(f).max() < 0.5

    def test_batch(self):
        a, b = _shifted_pair()
        frames = jnp.stack([jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(a)])
        out = flow.tvl1_flow_batch(frames)
        assert out.shape == (2, 64, 64, 2)

    def test_cv2_backends(self):
        a, b = _shifted_pair(shift=(3, 0))
        for backend in ("dis", "farneback"):
            f = flow.compute_flow(
                a.astype(np.uint8), b.astype(np.uint8), backend=backend
            )
            assert f.shape == (64, 64, 2)
            inner = f[16:-16, 16:-16]
            assert abs(np.median(inner[..., 0]) - 3.0) < 1.5


class TestMotionMaps:
    def test_jax_matches_numpy_transcription(self):
        rng = np.random.RandomState(0)
        flow_clip = [rng.rand(32, 32).astype(np.float64) for _ in range(4)]
        ref = motion_maps.motion_sts_np(flow_clip, size=8, input_size=32)
        ours = np.asarray(
            motion_maps.motion_sts_jax(
                jnp.asarray(np.stack(flow_clip)), size=8, input_size=32
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_magnitude_frames(self):
        rng = np.random.RandomState(1)
        frames = [rng.rand(32, 32) for _ in range(6)]
        mags = motion_maps.motion_magnitude_frames_np(frames, window=4)
        assert len(mags) == 6
        for m in mags:
            assert m.dtype == np.uint8
            # 8-px border zeroed
            assert m[:8].max() == 0 and m[:, :8].max() == 0

    def test_zero_boundary(self):
        m = np.ones((32, 32))
        z = motion_maps.zero_boundary_np(m)
        assert z[:8].max() == 0 and z[8:-8, 8:-8].min() == 1


class TestBBox:
    def _moving_blob_maps(self, T=6, H=96, W=128):
        maps = []
        for t in range(T):
            m = np.zeros((H, W), np.uint8)
            x = 30 + 4 * t
            m[40:70, x:x + 30] = 255
            maps.append(m)
        return maps

    def test_boxes_cover_blob(self):
        maps = self._moving_blob_maps()
        boxes = bbox.extract_boxes(maps, clip_union=False)
        assert len(boxes) == len(maps)
        for (x1, y1, x2, y2) in boxes:
            assert x2 > x1 and y2 > y1

    def test_clip_union_constant(self):
        maps = self._moving_blob_maps()
        boxes = bbox.extract_boxes(maps, clip_union=True)
        assert len(set(boxes)) == 1  # every frame overwritten with union
        x1, y1, x2, y2 = boxes[0]
        # union must span the blob's travel (x from ~30 to ~80)
        assert x1 < 40 and x2 > 65

    def test_empty_maps_fallback(self):
        maps = [np.zeros((96, 128), np.uint8)] * 4
        boxes = bbox.extract_boxes(maps, clip_union=True)
        x1, y1, x2, y2 = boxes[0]
        # central fallback box
        assert x2 > x1 and y2 > y1

    def test_json_roundtrip(self, tmp_path):
        path = str(tmp_path / "bb.json")
        bbox.write_bbox_json(path, {"vid": [(1, 2, 30, 40)] * 3})
        from mofo_tpu.data.filelist import MotionBoxIndex

        idx = MotionBoxIndex.from_file(path)
        np.testing.assert_allclose(
            idx.get("vid", [0, 2])[0], [1, 2, 30, 40]
        )

    def test_area_ratio(self):
        r = bbox.bbox_area_ratio([(0, 0, 50, 50)], 100, 100)
        assert abs(r - 0.25) < 1e-9


class TestAnnot:
    def test_template_cleanup(self):
        s = annot.clean_ssv2_template(
            "Pushing [something] from left to right"
        )
        assert s == "pushing something from left to right"

    def test_ssv2_list(self, tmp_path):
        labels = {"Pushing something": 17}
        split = [{"id": "42", "template": "Pushing [something]"}]
        (tmp_path / "labels.json").write_text(json.dumps(labels))
        (tmp_path / "train.json").write_text(json.dumps(split))
        entries = annot.build_ssv2_list(
            str(tmp_path / "labels.json"), str(tmp_path / "train.json"),
            "/videos", require_exists=False,
        )
        assert entries == [("/videos/42.mp4", 17)]

    def test_write_setting_roundtrip(self, tmp_path):
        from mofo_tpu.data.filelist import read_setting_file

        p = str(tmp_path / "train.csv")
        annot.write_setting_file(p, [("/a.mp4", 3), ("/b.mp4", 0)])
        clips = read_setting_file(p)
        assert [(c.path, c.label) for c in clips] == [
            ("/a.mp4", 3), ("/b.mp4", 0)]
