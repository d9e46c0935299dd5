"""Multi-clip x multi-crop test-time aggregation and EK-100 verb/noun
marginalization.

Reference behavior:
  - Test datasets pre-expand each video into (test_num_segment x
    test_num_crop) views tagged (chunk_nb, split_nb) (ssv2.py:68-77,
    kinetics.py:74-83).
  - final_test writes per-rank "<id> [logits] label chunk split" text
    files; rank 0 merges: per video, dedupe (chunk, split), softmax each
    view, mean, argmax -> top1/top5 (engine_for_finetuning.py:227-348).

TPU-native: no filesystem gather. Each host accumulates (video_idx, view
logits) arrays; aggregation is a segment-mean of softmaxed logits in
numpy (or a process_allgather across hosts — the arrays are tiny).
The same dedupe semantics hold: duplicate (video, chunk, split) rows are
dropped before averaging.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


class MultiViewAggregator:
    """Accumulates per-view logits and computes video-level metrics.

    add(video_ids, chunk_ids, split_ids, logits, labels) may be called any
    number of times (e.g. once per eval batch); finalize() returns
    (top1, top5, per-video predictions).
    """

    def __init__(self):
        self._rows: List[Tuple[str, int, int, np.ndarray, int]] = []

    def add(
        self,
        video_ids: Sequence,
        chunk_ids: Sequence[int],
        split_ids: Sequence[int],
        logits: np.ndarray,
        labels: Sequence[int],
    ) -> None:
        logits = np.asarray(logits, dtype=np.float64)
        for vid, c, s, lg, lb in zip(
            video_ids, chunk_ids, split_ids, logits, labels
        ):
            self._rows.append((str(vid), int(c), int(s), lg, int(lb)))

    def merge_feats(self) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
        """Dedupe (video, chunk, split), softmax each view, collect per
        video (engine_for_finetuning.py:299-324)."""
        feats: Dict[str, List[np.ndarray]] = {}
        labels: Dict[str, int] = {}
        seen = set()
        for vid, c, s, lg, lb in self._rows:
            key = (vid, c, s)
            if key in seen:
                continue
            seen.add(key)
            feats.setdefault(vid, []).append(softmax_np(lg))
            labels[vid] = lb
        return (
            {vid: np.mean(v, axis=0) for vid, v in feats.items()},
            labels,
        )

    def finalize(self) -> Tuple[float, float, Dict[str, int]]:
        """Returns (top1%, top5%, {video: predicted class})
        (compute_video, engine_for_finetuning.py:341-348)."""
        feats, labels = self.merge_feats()
        top1, top5, preds = [], [], {}
        for vid, feat in feats.items():
            label = labels[vid]
            pred = int(np.argmax(feat))
            preds[vid] = pred
            top1.append(1.0 if pred == label else 0.0)
            top5.append(
                1.0 if label in np.argsort(-feat)[:5] else 0.0
            )
        return (
            float(np.mean(top1)) * 100.0,
            float(np.mean(top5)) * 100.0,
            preds,
        )

    def state_arrays(self):
        """Export rows as arrays for cross-host allgather."""
        vids = [r[0] for r in self._rows]
        meta = np.array([(r[1], r[2], r[4]) for r in self._rows], np.int64)
        logits = np.stack([r[3] for r in self._rows]) if self._rows else (
            np.zeros((0, 0))
        )
        return vids, meta, logits

    @classmethod
    def from_parts(cls, parts) -> "MultiViewAggregator":
        agg = cls()
        for vids, meta, logits in parts:
            for vid, (c, s, lb), lg in zip(vids, meta, logits):
                agg._rows.append((vid, int(c), int(s), lg, int(lb)))
        return agg


_VID_BYTES = 64


def _encode_vids(vids: Sequence[str], width: int = _VID_BYTES) -> np.ndarray:
    arr = np.zeros((len(vids), width), np.uint8)
    for i, v in enumerate(vids):
        b = str(v).encode("utf-8")[:width]
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
    return arr


def _decode_vids(arr: np.ndarray) -> List[str]:
    return [
        bytes(row.tobytes()).rstrip(b"\x00").decode("utf-8") for row in arr
    ]


def gather_across_processes(agg: "MultiViewAggregator") -> "MultiViewAggregator":
    """Merge per-process aggregator rows into one global aggregator.

    Replaces the reference's filesystem gather of per-rank prediction
    files (<rank>.txt write + rank-0 merge, engine_for_finetuning.py:
    281-339) with a padded multihost allgather. No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return agg
    from jax.experimental import multihost_utils

    vids, meta, logits = agg.state_arrays()
    n = len(vids)
    c = logits.shape[1] if n else 0
    dims = np.asarray(
        multihost_utils.process_allgather(np.asarray([n, c], np.int64))
    )
    max_n = int(dims[:, 0].max())
    num_cls = int(dims[:, 1].max())
    if max_n == 0:
        return agg

    def pad_to(a, shape, dtype):
        out = np.zeros(shape, dtype)
        if a.size:
            out[: a.shape[0], ...] = a
        return out

    vid_g = np.asarray(multihost_utils.process_allgather(
        pad_to(_encode_vids(vids), (max_n, _VID_BYTES), np.uint8)
    ))
    meta_g = np.asarray(multihost_utils.process_allgather(
        pad_to(np.asarray(meta, np.int64), (max_n, 3), np.int64)
    ))
    logit_g = np.asarray(multihost_utils.process_allgather(
        pad_to(
            np.asarray(logits, np.float32), (max_n, num_cls), np.float32
        )
    ))
    parts = []
    for p in range(dims.shape[0]):
        k = int(dims[p, 0])
        parts.append(
            (_decode_vids(vid_g[p, :k]), meta_g[p, :k], logit_g[p, :k])
        )
    return MultiViewAggregator.from_parts(parts)


# ---------------------------------------------------------------------------
# EK-100 verb/noun marginalization (utils.py:584-606)
# ---------------------------------------------------------------------------


def get_marginal_indexes(
    action_to_vn: Sequence[Tuple[int, int]], mode: str
) -> List[np.ndarray]:
    """action_to_vn: list of (verb_id, noun_id) per action class index.
    Returns, per verb (or noun) id, the action indices containing it."""
    col = 0 if mode == "verb" else 1
    ids = np.array([a[col] for a in action_to_vn])
    out = []
    for v in range(ids.max() + 1):
        vals = np.nonzero(ids == v)[0]
        out.append(vals if len(vals) > 0 else np.array([0]))
    return out


def marginalize(
    probs: np.ndarray, indexes: List[np.ndarray]
) -> np.ndarray:
    """(B, n_actions) probs -> (B, n_verbs_or_nouns) marginal probs."""
    return np.stack(
        [probs[:, ilist].sum(1) for ilist in indexes], axis=1
    )


def action_label_space(
    verb_noun_pairs: Sequence[Tuple[int, int]]
) -> Tuple[List[str], Dict[str, int]]:
    """Build the sorted 'verb:noun' action label space
    (generate_label_map, utils.py:556-582). Input: (verb, noun) int pairs
    from the EK train+val CSVs. Returns (vn_list, mapping_vn2act).

    NOTE: sorted() on the string keys — '10:1' < '2:1' — reproduces the
    reference's lexicographic class ordering exactly."""
    vn_list = sorted({f"{v}:{n}" for v, n in verb_noun_pairs})
    return vn_list, {vn: i for i, vn in enumerate(vn_list)}
