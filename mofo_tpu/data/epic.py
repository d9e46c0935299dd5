"""EPIC-KITCHENS-100 dataset: timestamp-delimited action clips.

Reference: epic_kitchens.py VideoClassyDataset (+_BB) — the AVION-style
loader actually wired into the runners (datasets.py:217-226,420-429):
  - samples come from the EPIC_100 CSVs; row i maps to video_<i>.mp4 in
    <root>/<split> (pre-cut action segments, epic_kitchens.py:455-463)
  - frame ids: jittered uniform grid over the clip
    (get_frame_ids, epic_kitchens.py:967-974)
  - labels: verb / noun / 'verb:noun' action id from the sorted action
    space (utils.py:556-582)
  - test mode expands (chunk, crop) views like the SSV2 dataset
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from mofo_tpu.data import sampling
from mofo_tpu.data.filelist import EpicEntry, MotionBoxIndex
from mofo_tpu.data.video_reader import VideoReader


@dataclasses.dataclass
class EpicClipDataset:
    entries: Sequence[EpicEntry]
    video_root: str
    split: str  # train | validation (test reads validation videos)
    mode: str = "train"
    classtype: str = "action"  # verb | noun | action
    action_mapping: Optional[Dict[str, int]] = None  # for classtype=action
    num_frames: int = 16
    decode_size: Tuple[int, int] = (256, 320)
    test_num_segment: int = 2
    test_num_crop: int = 3
    boxes: Optional[MotionBoxIndex] = None

    def __post_init__(self):
        if self.classtype == "action" and self.action_mapping is None:
            raise ValueError("classtype=action needs action_mapping")
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

    def _label(self, e: EpicEntry) -> int:
        if self.classtype == "verb":
            return e.verb
        if self.classtype == "noun":
            return e.noun
        return self.action_mapping[f"{e.verb}:{e.noun}"]

    def _video_path(self, e: EpicEntry) -> str:
        sub = "validation" if self.mode == "test" else self.split
        return os.path.join(self.video_root, sub, f"video_{e.index}.mp4")

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.mode == "test":
            entry_idx, chunk_nb, split_nb = self._views[i]
        else:
            entry_idx, chunk_nb, split_nb = i, 0, 0
        e = self.entries[entry_idx]
        path = self._video_path(e)
        h, w = self.decode_size
        with VideoReader(path, width=w, height=h) as vr:
            n = len(vr)
            if self.mode == "train":
                ids = sampling.timestamp_frame_ids(
                    0, n - 1, num_segments=self.num_frames, jitter=True,
                    rng=np.random,
                )
            elif self.mode == "validation":
                ids = sampling.timestamp_frame_ids(
                    0, n - 1, num_segments=self.num_frames, jitter=False
                )
            else:
                grid = sampling.uniform_test_indices(
                    n,
                    num_segment=self.num_frames,
                    test_num_segment=self.test_num_segment,
                )
                ids = grid[chunk_nb :: self.test_num_segment]
            ids = np.clip(ids, 0, n - 1)
            frames = vr.get_batch(ids)
        out = {
            "clip": frames,
            "label": np.int32(self._label(e)),
            "video_idx": np.int32(entry_idx),
            "chunk_nb": np.int32(chunk_nb),
            "split_nb": np.int32(split_nb),
        }
        if self.boxes is not None:
            key = MotionBoxIndex.video_key(path)
            out["boxes"] = self.boxes.get(key, ids)
        return out
