"""Host-side input pipeline: datasets, per-host sharding, and a prefetching
loader feeding the device.

Replaces torch DataLoader + DistributedSampler (run_mae_pretraining.py:
187-206). Host work is intentionally thin — decode fixed-size uint8 frames
(the native decoder scales during decode) and stack; all augmentation runs
batched on device (mofo_tpu.ops.augment).

Components:
  ShardedSampler     — DistributedSampler parity: per-epoch seeded
                       permutation, padded to a multiple of world size,
                       strided split per process
  PretrainClipDataset  — file list + TSN sampling (+ optional motion boxes)
  FinetuneClipDataset  — cls datasets: dense (Kinetics) / uniform (SSV2) /
                       timestamp (EK) samplers, train/val/test modes with
                       (chunk, split) view expansion for test
  SyntheticClipDataset — random clips for tests/benchmarks
  PrefetchLoader     — background-thread batching + jax.device_put
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mofo_tpu.data.filelist import ClipEntry, MotionBoxIndex
from mofo_tpu.data import sampling
from mofo_tpu.data.video_reader import VideoReader


import functools


@functools.lru_cache(maxsize=65536)
def _entry_loadable(path: str) -> bool:
    """Reference bad-video guards (kinetics.py:229-243): exists, >1KB,
    decodable. Cached per path for the life of the process."""
    if not os.path.exists(path) or os.path.getsize(path) < 1024:
        return False
    try:
        with VideoReader(path) as vr:
            return len(vr) > 0
    except (RuntimeError, OSError):
        return False


def _resilient_entry(entries, i: int):
    """Skip-and-resample on corrupt/missing videos (the reference's
    while-loop resample in __getitem__, kinetics.py:92-97,229-243)."""
    entry = entries[i]
    tries = 0
    while not _entry_loadable(entry.path) and tries < 10:
        j = int(np.random.randint(len(entries)))
        print(f"video {entry.path} not loadable; resampling index {j}")
        entry = entries[j]
        tries += 1
    return entry


class ShardedSampler:
    """Per-epoch shuffled, per-process strided index sampler
    (torch DistributedSampler semantics: pad to a multiple of world size
    by wrapping, then take rank::world)."""

    def __init__(
        self,
        n: int,
        rank: int = 0,
        world: int = 1,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.n = n
        self.rank = rank
        self.world = world
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        if self.shuffle:
            g = np.random.RandomState(self.seed + self.epoch)
            order = g.permutation(self.n)
        else:
            order = np.arange(self.n)
        total = ((self.n + self.world - 1) // self.world) * self.world
        if total > self.n:
            order = np.concatenate([order, order[: total - self.n]])
        return order[self.rank :: self.world]


@dataclasses.dataclass
class PretrainClipDataset:
    """Decoded clips for MAE pretraining (VideoMAE / VideoMAE_BB datasets,
    kinetics.py:377-561, 996-1064). Yields uint8 frames at a fixed decoded
    size; masking and augmentation happen on device."""

    entries: Sequence[ClipEntry]
    num_frames: int = 16
    sampling_rate: int = 2
    decode_size: Tuple[int, int] = (256, 320)  # (h, w)
    boxes: Optional[MotionBoxIndex] = None
    pin_seed: bool = False  # reproduce the reference's np.seed(10) quirk

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        entry = _resilient_entry(self.entries, i)
        h, w = self.decode_size
        with VideoReader(entry.path, width=w, height=h) as vr:
            duration = len(vr)
            ids = sampling.tsn_frame_ids(
                duration,
                skip_length=self.num_frames * self.sampling_rate,
                new_step=self.sampling_rate,
                pin_seed=self.pin_seed,
                rng=np.random,
            )
            frames = vr.get_batch(ids)
        out = {"clip": frames}
        if self.boxes is not None:
            # Box JSONs from the offline factory are in the factory's
            # canonical pixel space; configure decode_size to match it
            # (the reference hardcodes both to the same preprocessed
            # resolution, kinetics.py:915-917).
            key = MotionBoxIndex.video_key(entry.path)
            out["boxes"] = self.boxes.get(key, ids)
        return out


_CLS_SAMPLERS = ("dense", "uniform", "timestamp")


@dataclasses.dataclass
class FinetuneClipDataset:
    """Classification clips (VideoClsDataset / SSVideoClsDataset /
    VideoClassyDataset). mode: train | validation | test. In test mode the
    sample list is pre-expanded x (test_num_segment * test_num_crop) with
    (chunk_nb, split_nb) tags (ssv2.py:68-77)."""

    entries: Sequence[ClipEntry]
    mode: str = "train"
    sampler: str = "uniform"  # dense | uniform
    num_frames: int = 16
    frame_sample_rate: int = 4  # dense sampler stride
    decode_size: Tuple[int, int] = (256, 320)
    test_num_segment: int = 2
    test_num_crop: int = 3
    boxes: Optional[MotionBoxIndex] = None

    def __post_init__(self):
        assert self.sampler in ("dense", "uniform"), self.sampler
        if self.mode == "test":
            self._views = [
                (i, c, s)
                for i in range(len(self.entries))
                for c in range(self.test_num_segment)
                for s in range(self.test_num_crop)
            ]

    def __len__(self) -> int:
        if self.mode == "test":
            return len(self._views)
        return len(self.entries)

    def _frame_ids(self, duration: int, chunk_nb: int = 0) -> np.ndarray:
        if self.mode == "train":
            if self.sampler == "dense":
                return sampling.dense_train_indices(
                    duration,
                    clip_len=self.num_frames,
                    frame_sample_rate=self.frame_sample_rate,
                    rng=np.random,
                )
            return sampling.uniform_train_indices(
                duration, num_segment=self.num_frames, rng=np.random
            )
        if self.mode == "validation":
            if self.sampler == "dense":
                return sampling.dense_test_indices(
                    duration,
                    clip_len=self.num_frames,
                    frame_sample_rate=self.frame_sample_rate,
                )
            # SSV2 val: uniform mid-segment ticks
            tick = duration / float(self.num_frames)
            return np.asarray(
                [int(tick / 2.0 + tick * x) for x in range(self.num_frames)],
                dtype=np.int64,
            )
        if self.sampler == "dense":
            # Kinetics-style: full strided enumeration, then a temporal
            # window offset by chunk_nb (kinetics.py:144-155,246-252)
            all_idx = sampling.dense_test_indices(
                duration,
                clip_len=self.num_frames,
                frame_sample_rate=self.frame_sample_rate,
            )
            n = len(all_idx)
            if n > self.num_frames:
                max_start = n - self.num_frames
                start = int(
                    round(
                        max_start
                        * chunk_nb
                        / max(self.test_num_segment - 1, 1)
                    )
                )
                return all_idx[start : start + self.num_frames]
            return all_idx
        # SSV2-style: the tick grid; chunk picks [chunk_nb::segments]
        grid = sampling.uniform_test_indices(
            duration,
            num_segment=self.num_frames,
            test_num_segment=self.test_num_segment,
        )
        return grid[chunk_nb :: self.test_num_segment]

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.mode == "test":
            entry_idx, chunk_nb, split_nb = self._views[i]
        else:
            entry_idx, chunk_nb, split_nb = i, 0, 0
        entry = _resilient_entry(self.entries, entry_idx)
        h, w = self.decode_size
        with VideoReader(entry.path, width=w, height=h) as vr:
            ids = self._frame_ids(len(vr), chunk_nb)
            ids = np.clip(ids, 0, len(vr) - 1)
            frames = vr.get_batch(ids)
        out = {
            "clip": frames,
            "label": np.int32(entry.label),
            "video_idx": np.int32(entry_idx),
            "chunk_nb": np.int32(chunk_nb),
            "split_nb": np.int32(split_nb),
        }
        if self.boxes is not None:
            key = MotionBoxIndex.video_key(entry.path)
            out["boxes"] = self.boxes.get(key, ids)
        return out


@dataclasses.dataclass
class SyntheticClipDataset:
    """Random uint8 clips (+labels/boxes) for tests and benchmarks."""

    n: int = 64
    num_frames: int = 16
    decode_size: Tuple[int, int] = (256, 320)
    num_classes: int = 10
    with_boxes: bool = False
    seed: int = 0

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed + i)
        h, w = self.decode_size
        out = {
            "clip": rng.randint(
                0, 256, (self.num_frames, h, w, 3), dtype=np.uint8
            ),
            "label": np.int32(rng.randint(self.num_classes)),
            "video_idx": np.int32(i),
            "chunk_nb": np.int32(0),
            "split_nb": np.int32(0),
        }
        if self.with_boxes:
            x1 = rng.randint(0, w // 2)
            y1 = rng.randint(0, h // 2)
            box = [x1, y1, x1 + rng.randint(8, w // 2),
                   y1 + rng.randint(8, h // 2)]
            out["boxes"] = np.tile(
                np.asarray(box, np.float32), (self.num_frames, 1)
            )
        return out


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


# process-pool decode workers: module-level so they pickle; each worker
# process unpickles the dataset ONCE at pool start (torch DataLoader
# worker semantics)
_DECODE_PROC_DS = None


def _decode_proc_init(ds_bytes):
    global _DECODE_PROC_DS
    import pickle

    _DECODE_PROC_DS = pickle.loads(ds_bytes)


def _decode_proc_getitem(i: int):
    return _DECODE_PROC_DS[i]


class PrefetchLoader:
    """Background loader: sample -> batch -> (optionally sharded)
    device_put. Replaces DataLoader(num_workers, prefetch) for the thin
    host pipeline. drop_last semantics like the reference train loaders.

    - num_workers > 1 decodes samples of a batch concurrently in a thread
      pool (FFmpeg decode releases the GIL), the analogue of the
      reference's DataLoader(num_workers=4) per rank.
    - worker_mode="process" decodes in a process pool instead (each
      worker unpickles the dataset once at pool start): for pipelines
      whose python-side work (PIL/cv2 transforms, json box lookups) is
      GIL-bound rather than decode-bound — the true analogue of torch
      DataLoader worker processes.
    - drop_last=False pads the final partial batch up to batch_size by
      wrapping to the front of the index list (DistributedSampler-style),
      keeping every batch mesh-divisible; padded rows are flagged False
      in the emitted "valid" mask.
    - Under multi-process JAX (jax.process_count() > 1) host-local arrays
      are assembled into global arrays via
      jax.make_array_from_process_local_data — a plain device_put of a
      host-local batch onto a global-mesh sharding is invalid there.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[ShardedSampler] = None,
        sharding=None,
        prefetch: int = 2,
        drop_last: bool = True,
        to_device: bool = True,
        num_workers: int = 1,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(len(dataset),
                                                 shuffle=False)
        self.sharding = sharding
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.to_device = to_device
        self.num_workers = max(1, num_workers)
        assert worker_mode in ("thread", "process"), worker_mode
        self.worker_mode = worker_mode

    def __len__(self) -> int:
        n = len(self.sampler.indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, sel) -> Dict[str, np.ndarray]:
        if self.num_workers > 1 and len(sel) > 1:
            if self._pool is None:
                import concurrent.futures as cf

                if self.worker_mode == "process":
                    import pickle

                    self._pool = cf.ProcessPoolExecutor(
                        self.num_workers,
                        initializer=_decode_proc_init,
                        initargs=(pickle.dumps(self.dataset),),
                    )
                else:
                    self._pool = cf.ThreadPoolExecutor(self.num_workers)
            if self.worker_mode == "process":
                samples = list(
                    self._pool.map(_decode_proc_getitem,
                                   [int(i) for i in sel])
                )
            else:
                samples = list(
                    self._pool.map(
                        lambda i: self.dataset[int(i)], sel
                    )
                )
        else:
            samples = [self.dataset[int(i)] for i in sel]
        return collate(samples)

    def _to_global(self, batch: Dict) -> Dict:
        if self.sharding is not None:
            if jax.process_count() > 1:
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        self.sharding, np.asarray(x)
                    ),
                    batch,
                )
            return jax.tree.map(
                lambda x: jax.device_put(x, self.sharding), batch
            )
        return jax.tree.map(jax.device_put, batch)

    def __iter__(self) -> Iterator[Dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        self._pool = None

        def worker():
            try:
                idxs = self.sampler.indices()
                batch_count = len(self)
                for b in range(batch_count):
                    if stop.is_set():
                        return
                    sel = idxs[b * self.batch_size:(b + 1) * self.batch_size]
                    n_real = len(sel)
                    if not self.drop_last and n_real < self.batch_size:
                        pad = np.resize(
                            idxs, self.batch_size - n_real
                        )
                        sel = np.concatenate([sel, pad])
                    batch = self._fetch(sel)
                    if not self.drop_last:
                        valid = np.zeros(len(sel), dtype=bool)
                        valid[:n_real] = True
                        batch["valid"] = valid
                    q.put(batch)
            except Exception as e:  # surface errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                if self.to_device:
                    item = self._to_global(item)
                yield item
        finally:
            stop.set()
            if self._pool is not None:
                self._pool.shutdown(wait=False)
                self._pool = None
