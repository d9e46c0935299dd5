"""Data pipeline: native/OpenCV decode parity, datasets, sharded sampling,
prefetch loader, and the composed device augmentation pipelines."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofo_tpu.core import constants
from mofo_tpu.data import pipeline as P
from mofo_tpu.data.filelist import ClipEntry, MotionBoxIndex
from mofo_tpu.data.video_reader import VideoReader, native_available
from mofo_tpu.ops import augment as A


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
    )
    for i in range(50):
        frame = np.full((48, 64, 3), (i * 5) % 255, np.uint8)
        frame[:8, :, 0] = i * 5 % 255
        w.write(frame[:, :, ::-1])
    w.release()
    return path


class TestVideoReader:
    def test_native_backend_available(self):
        assert native_available(), "C++ decoder must build in this image"

    def test_native_matches_opencv(self, video_file):
        ids = [0, 3, 17, 17, 49, 5]
        with VideoReader(video_file, backend="native") as vn:
            assert vn.backend == "native"
            assert len(vn) == 50
            a = vn.get_batch(ids)
        with VideoReader(video_file, backend="opencv") as vo:
            b = vo.get_batch(ids)
        np.testing.assert_array_equal(a, b)

    def test_scaled_decode(self, video_file):
        with VideoReader(video_file, width=32, height=24,
                         backend="native") as vr:
            out = vr.get_batch([0, 1])
            assert out.shape == (2, 24, 32, 3)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            VideoReader("/nonexistent.mp4")

    def test_out_of_range_index(self, video_file):
        with VideoReader(video_file, backend="native") as vr:
            with pytest.raises(RuntimeError):
                vr.get_batch([999])


class TestShardedSampler:
    def test_partition_covers_all(self):
        parts = [
            P.ShardedSampler(10, rank=r, world=4, seed=1).indices()
            for r in range(4)
        ]
        assert all(len(p) == 3 for p in parts)  # padded to 12
        covered = set(np.concatenate(parts).tolist())
        assert covered == set(range(10))

    def test_epoch_changes_order(self):
        s = P.ShardedSampler(20, seed=1)
        a = s.indices().copy()
        s.set_epoch(1)
        b = s.indices()
        assert not np.array_equal(a, b)
        assert sorted(a) == sorted(b)


class TestDatasets:
    def test_pretrain_dataset(self, video_file):
        ds = P.PretrainClipDataset(
            entries=[ClipEntry(video_file, 0)],
            num_frames=8,
            sampling_rate=2,
            decode_size=(48, 64),
        )
        item = ds[0]
        assert item["clip"].shape == (8, 48, 64, 3)
        assert item["clip"].dtype == np.uint8

    def test_pretrain_dataset_with_boxes(self, video_file):
        boxes = MotionBoxIndex(
            {"clip": [
                {"labels": [{"box2d": {"x1": 1, "y1": 2, "x2": 30,
                                       "y2": 40}}]}
            ] * 50}
        )
        ds = P.PretrainClipDataset(
            entries=[ClipEntry(video_file, 0)],
            num_frames=4,
            decode_size=(48, 64),
            boxes=boxes,
        )
        item = ds[0]
        assert item["clip"].shape[0] == 4
        assert item["boxes"].shape == (4, 4)

    def test_finetune_dataset_modes(self, video_file):
        for mode, n_expect in (("train", 2), ("validation", 2),
                               ("test", 2 * 2 * 3)):
            ds = P.FinetuneClipDataset(
                entries=[ClipEntry(video_file, 3)] * 2,
                mode=mode,
                sampler="uniform",
                num_frames=8,
                decode_size=(48, 64),
            )
            assert len(ds) == n_expect
            item = ds[0]
            assert item["clip"].shape == (8, 48, 64, 3)
            assert int(item["label"]) == 3

    def test_test_views_tagged(self, video_file):
        ds = P.FinetuneClipDataset(
            entries=[ClipEntry(video_file, 0)],
            mode="test",
            num_frames=8,
            decode_size=(48, 64),
        )
        tags = {(int(ds[i]["chunk_nb"]), int(ds[i]["split_nb"]))
                for i in range(len(ds))}
        assert tags == {(c, s) for c in range(2) for s in range(3)}


class TestPrefetchLoader:
    def test_batches_and_shapes(self):
        ds = P.SyntheticClipDataset(n=10, num_frames=4,
                                    decode_size=(32, 40))
        loader = P.PrefetchLoader(ds, batch_size=4, to_device=False)
        batches = list(loader)
        assert len(batches) == 2  # drop_last
        assert batches[0]["clip"].shape == (4, 4, 32, 40, 3)
        assert batches[0]["label"].shape == (4,)

    def test_error_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise ValueError("boom")

        loader = P.PrefetchLoader(Bad(), batch_size=2, to_device=False)
        with pytest.raises(ValueError):
            list(loader)

    def test_device_put(self):
        ds = P.SyntheticClipDataset(n=4, num_frames=2,
                                    decode_size=(16, 16))
        loader = P.PrefetchLoader(ds, batch_size=2)
        batch = next(iter(loader))
        assert isinstance(batch["clip"], jax.Array)


class TestAugmentPipelines:
    def _u8(self, B=2, T=4, H=64, W=80):
        rng = np.random.RandomState(0)
        return jnp.asarray(
            rng.randint(0, 256, (B, T, H, W, 3), dtype=np.uint8)
        )

    def test_pretrain_augment_shapes_and_stats(self):
        clips = self._u8()
        out, _ = A.pretrain_augment(jax.random.PRNGKey(0), clips,
                                    out_size=32)
        assert out.shape == (2, 4, 32, 32, 3)
        # normalized: roughly zero-mean for uniform noise input
        m = float(jnp.mean(out))
        assert abs(m) < 1.0

    def test_pretrain_augment_boxes(self):
        clips = self._u8()
        boxes = jnp.tile(jnp.asarray([10.0, 10.0, 70.0, 60.0]),
                         (2, 4, 1))
        out, bx = A.pretrain_augment(jax.random.PRNGKey(1), clips,
                                     out_size=32, boxes=boxes)
        assert bx.shape == (2, 4, 4)
        b = np.asarray(bx)
        assert (b[..., 0] >= 0).all() and (b[..., 2] <= 32 + 1e-3).all()
        assert (b[..., 2] >= b[..., 0]).all()

    def test_finetune_augment(self):
        clips = self._u8()
        out, _ = A.finetune_augment(
            jax.random.PRNGKey(2), clips, out_size=32,
            aa="rand-m7-n2-mstd0.5-inc1", reprob=0.5,
        )
        assert out.shape == (2, 4, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_eval_augment_center_crop(self):
        clips = self._u8(H=64, W=80)
        out, _ = A.eval_augment(clips, out_size=32, short_side=32)
        assert out.shape == (2, 4, 32, 32, 3)

    def test_test_view_windows_differ(self):
        clips = self._u8(H=64, W=80)
        views = [
            np.asarray(A.test_view_augment(clips, s, out_size=32,
                                           short_side=32)[0])
            for s in range(3)
        ]
        assert views[0].shape == (2, 4, 32, 32, 3)
        assert not np.allclose(views[0], views[2])


class TestResilientLoading:
    def test_bad_entry_resamples(self, video_file, capsys):
        from mofo_tpu.data.filelist import ClipEntry
        from mofo_tpu.data import pipeline as PP

        ds = PP.PretrainClipDataset(
            entries=[ClipEntry("/nonexistent.mp4", 0),
                     ClipEntry(video_file, 1)],
            num_frames=4,
            decode_size=(48, 64),
        )
        np.random.seed(0)
        item = ds[0]  # bad entry resamples to a loadable one
        assert item["clip"].shape == (4, 48, 64, 3)
        assert "not loadable" in capsys.readouterr().out

    def test_loadable_guard(self, video_file):
        from mofo_tpu.data.pipeline import _entry_loadable

        assert _entry_loadable(video_file)
        assert not _entry_loadable("/nonexistent.mp4")


class TestMultiProcessFeeding:
    def test_to_global_multiprocess_branch(self, monkeypatch):
        """The process_count()>1 branch assembles global arrays via
        jax.make_array_from_process_local_data; with one real process
        (whose devices cover the mesh) it must equal a plain sharded
        device_put, so the branch is exercisable in CI."""
        from mofo_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=8))
        sharding = mesh_lib.batch_sharding(mesh)
        ds = P.SyntheticClipDataset(n=8, num_frames=2,
                                    decode_size=(16, 16))
        loader = P.PrefetchLoader(ds, batch_size=8, sharding=sharding,
                                  to_device=True)
        batch_np = loader._fetch(np.arange(8))
        expect = {k: np.asarray(v) for k, v in batch_np.items()}

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        global_batch = loader._to_global(batch_np)
        for k, v in global_batch.items():
            assert v.shape[0] == 8
            assert v.sharding.is_equivalent_to(sharding, v.ndim)
            np.testing.assert_array_equal(np.asarray(v), expect[k])


class TestWorkerPool:
    def test_threaded_decode_matches_serial(self):
        """num_workers > 1 must yield identical batches to serial
        fetch (thread pool is order-preserving via map)."""
        from mofo_tpu.data.pipeline import (
            PrefetchLoader, SyntheticClipDataset,
        )

        ds = SyntheticClipDataset(n=8, num_frames=2, decode_size=(16, 20))
        serial = list(PrefetchLoader(ds, 4, to_device=False,
                                     num_workers=1))
        pooled = list(PrefetchLoader(ds, 4, to_device=False,
                                     num_workers=3))
        assert len(serial) == len(pooled) == 2
        for a, b in zip(serial, pooled):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_process_decode_matches_serial(self):
        """worker_mode='process' (torch-DataLoader-style worker
        processes; dataset unpickled once per worker) must yield
        identical batches to serial fetch."""
        from mofo_tpu.data.pipeline import (
            PrefetchLoader, SyntheticClipDataset,
        )

        ds = SyntheticClipDataset(n=8, num_frames=2, decode_size=(16, 20))
        serial = list(PrefetchLoader(ds, 4, to_device=False,
                                     num_workers=1))
        pooled = list(PrefetchLoader(ds, 4, to_device=False,
                                     num_workers=2,
                                     worker_mode="process"))
        assert len(serial) == len(pooled) == 2
        for a, b in zip(serial, pooled):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
