"""Tube masking and motion-aware (bounding-box-biased) tube masking.

The MOFO core. Reference behavior (/root/reference/masking_generator.py):

  TubeMaskingGenerator (lines 3-24): per sample build one boolean row of
  length 196 (14x14) with int(mask_ratio*196) ones, shuffle it, tile over the
  8 temporal positions ("tube" = same spatial mask at every timestep).

  TubeMaskingGenerator_BB (lines 27-85): mark patches touching the motion
  bounding box, shuffle them, force-mask min(num_masks, int(n_inside *
  mask_ratio_BB)) of them, then fill the remaining mask budget from other
  patches. Reference quirks (SURVEY.md section 2.2) reproduced only under
  bug_compat=True:
    (q1) the loop index never advances, so every patch is tested against the
         FIRST frame's box only;
    (q2) the intersection test swaps axes (row index compared against the
         box's x-extent) and uses `and` where the geometry needs `or`, so the
         "inside" region is the union of a row band and a column band (a
         cross), not the box;
    (q3) the remaining-fill candidates are drawn from patch indices
         0..num_masks-1 (0..175) instead of all 196.
  With bug_compat=False (the default) we implement the documented intent
  (README.md:16): 90% total tube masking with mask_ratio_BB of the in-box
  tubes forced masked, fill drawn uniformly from all remaining patches.

Everything in the jnp section runs on device with static shapes: masks have
a guaranteed constant number of True entries per sample, which is what lets
the encoder drop masked tokens with a fixed-size gather under jit.

Box convention: (x1, y1, x2, y2) in pixels, x = horizontal (column),
y = vertical (row); same as the bbox JSONs produced by the offline factory.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------
# On-device (jnp) generators — production path
# --------------------------------------------------------------------------


def num_masked_per_frame(patches_per_frame: int, mask_ratio: float) -> int:
    """int(mask_ratio * patches_per_frame), reference masking_generator.py:8."""
    return int(mask_ratio * patches_per_frame)


def tube_mask(
    rng: Array,
    batch: int,
    *,
    temporal_positions: int = 8,
    patches_per_frame: int = 196,
    mask_ratio: float = 0.9,
) -> Array:
    """Random tube mask. Returns bool (batch, temporal_positions *
    patches_per_frame); True = masked. Exactly int(mask_ratio * ppf) masked
    patches per temporal row, same spatial pattern at every timestep."""
    n_mask = num_masked_per_frame(patches_per_frame, mask_ratio)
    scores = jax.random.uniform(rng, (batch, patches_per_frame))
    # Patches with the n_mask smallest scores are masked: a uniform random
    # subset of fixed size (equivalent to shuffling a 0/1 row).
    ranks = _rank_small(scores)
    frame_mask = ranks < n_mask  # (B, ppf)
    mask = jnp.tile(frame_mask[:, None, :], (1, temporal_positions, 1))
    return mask.reshape(batch, temporal_positions * patches_per_frame)


def box_to_patch_map(
    boxes: Array,
    *,
    patches_per_side: int = 14,
    patch_size: int = 16,
    bug_compat: bool = False,
    edge: str = "inclusive",
) -> Array:
    """Rasterize pixel boxes onto the patch grid.

    boxes: (..., 4) = (x1, y1, x2, y2) in pixels.
    Returns bool (..., patches_per_side**2), True where the patch is
    "inside" (touches) the box, in row-major (j*W + k) patch order.

    bug_compat=True reproduces the reference's axis-swapped cross-shaped
    test (masking_generator.py:48-57); bug_compat=False is the true
    rectangle intersection.

    edge: the reference rasterizes boxes two different ways —
      'inclusive': boundary-touching counts (the mask generator's
        comparisons, masking_generator.py:55);
      'paint': half-open pixel ranges [x1, x2), as produced by the
        BB-focused classifier's tensor-slice painting
        (modeling_finetune.py:599).
    """
    P, s = patches_per_side, patch_size
    j = jnp.arange(P)  # patch row
    k = jnp.arange(P)  # patch col
    row_lo = (j * s)[:, None]  # (P, 1)
    row_hi = (j * s + s)[:, None]
    col_lo = (k * s)[None, :]  # (1, P)
    col_hi = (k * s + s)[None, :]

    x1 = boxes[..., 0:1, None]
    y1 = boxes[..., 1:2, None]
    x2 = boxes[..., 2:3, None]
    y2 = boxes[..., 3:4, None]

    if bug_compat:
        # Reference: row extent compared against the box x-range, column
        # extent against the y-range, joined with `and` on the disjoint
        # tests => "inside" iff NOT (row-disjoint-from-x AND col-disjoint-
        # from-y): a cross of one row band and one column band.
        row_disjoint = jnp.logical_or(x1 > row_hi, x2 < row_lo)
        col_disjoint = jnp.logical_or(y1 > col_hi, y2 < col_lo)
        inside = jnp.logical_not(jnp.logical_and(row_disjoint, col_disjoint))
    elif edge == "inclusive":
        x_overlap = jnp.logical_and(x1 <= col_hi, x2 >= col_lo)
        y_overlap = jnp.logical_and(y1 <= row_hi, y2 >= row_lo)
        nonempty = jnp.logical_and(x2 > x1, y2 > y1)
        inside = x_overlap & y_overlap & nonempty
    elif edge == "paint":
        x_overlap = jnp.logical_and(x1 < col_hi, x2 > col_lo)
        y_overlap = jnp.logical_and(y1 < row_hi, y2 > row_lo)
        inside = x_overlap & y_overlap
    else:
        raise ValueError(f"unknown edge mode: {edge}")
    return inside.reshape(boxes.shape[:-1] + (P * P,))


def _rank_small(keys: Array) -> Array:
    """rank[i] = position of keys[i] in the ascending stable sort of the
    last axis (== argsort(argsort(keys))).

    The sort runs along axis 0 of the transposed array: XLA sorts along
    the minor (lane) axis serialize into cross-lane shuffles, while a
    non-minor-axis sort vectorizes every compare-exchange over the batch
    in lanes — measured ~10x faster on v5e at (48, 196)."""
    kt = jnp.moveaxis(keys, -1, 0)
    ranks = jnp.argsort(jnp.argsort(kt, axis=0), axis=0)
    return jnp.moveaxis(ranks, 0, -1).astype(jnp.int32)


def _rank_by_score(scores: Array, candidates: Array) -> Array:
    """Rank of each position among `candidates` when ordered by `scores`
    (non-candidates get large ranks). Shapes (..., N) -> int32 (..., N)."""
    keys = jnp.where(candidates, scores, jnp.inf)
    return _rank_small(keys)


def motion_tube_mask(
    rng: Array,
    boxes: Array,
    *,
    temporal_positions: int = 8,
    patches_per_side: int = 14,
    patch_size: int = 16,
    mask_ratio: float = 0.9,
    mask_ratio_bb: float = 0.75,
    bug_compat: bool = False,
    box_reduce: str = "first",
) -> Array:
    """Motion-aware tube mask biased into the bounding box.

    rng: PRNG key. boxes: (B, T, 4) per-frame pixel boxes (T = raw frames).
    Returns bool (B, temporal_positions * patches_per_side**2), exactly
    int(mask_ratio * ppf) masked per temporal row.

    box_reduce: 'first' uses the first frame's box (matches the reference's
    effective behavior — masking_generator.py:46); 'union' uses the
    min/max union box over all frames (the offline factory already emits
    clip-union boxes for SSV2, bounding_box_creator_SSV.py:413-434).
    """
    B = boxes.shape[0]
    ppf = patches_per_side * patches_per_side
    n_mask = num_masked_per_frame(ppf, mask_ratio)

    if box_reduce == "first":
        box = boxes[:, 0, :]
    elif box_reduce == "union":
        box = jnp.concatenate(
            [
                jnp.min(boxes[..., 0:2], axis=1),
                jnp.max(boxes[..., 2:4], axis=1),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown box_reduce: {box_reduce}")

    inside = box_to_patch_map(
        box,
        patches_per_side=patches_per_side,
        patch_size=patch_size,
        bug_compat=bug_compat,
    )  # (B, ppf)
    n_inside = jnp.sum(inside, axis=-1)  # (B,)
    cap = jnp.minimum(
        n_mask, (n_inside * mask_ratio_bb).astype(jnp.int32)
    )  # (B,)

    rng1, rng2 = jax.random.split(rng)
    r1 = jax.random.uniform(rng1, (B, ppf))
    r2 = jax.random.uniform(rng2, (B, ppf))

    # Stage 1: a uniform random subset of `cap` in-box patches.
    rank_in = _rank_by_score(r1, inside)
    selected_bb = inside & (rank_in < cap[:, None])

    # Stage 2: fill the budget (n_mask - cap) from the remaining pool.
    if bug_compat:
        # Reference draws fills only from patch indices 0..n_mask-1
        # (masking_generator.py:72), excluding already-selected ones.
        low_idx = jnp.arange(ppf) < n_mask
        pool = low_idx[None, :] & ~selected_bb
    else:
        pool = ~selected_bb
    rank_fill = _rank_by_score(r2, pool)
    n_fill = n_mask - cap
    selected_fill = pool & (rank_fill < n_fill[:, None])

    frame_mask = selected_bb | selected_fill  # (B, ppf)
    mask = jnp.tile(frame_mask[:, None, :], (1, temporal_positions, 1))
    return mask.reshape(B, temporal_positions * ppf)


def tokens_in_box(
    boxes: Array,
    token_idx: Array,
    *,
    tubelet_size: int = 2,
    patches_per_side: int = 14,
    patch_size: int = 16,
) -> Array:
    """In-box test evaluated AT token indices, without a (B, N) map gather.

    boxes: (B, T, 4) per-frame pixel boxes; token_idx: (B, M) int token
    positions. Returns bool (B, M): token (t, j, k) is in-box iff any of
    its tubelet frames' boxes paint-overlaps patch (j, k) — bit-identical
    to take_along_axis(models.bb_focused.token_in_box_map(boxes), idx).

    Why: gathering the (B, N) bool/f32 map at (B, M) indices is a
    1-element-per-row gather — 0.69 ms/step of pure DMA overhead at the
    ViT-B pretrain geometry (48, 1408). Here the box bounds are selected
    per token with an exact one-hot f32 matmul over the 8 temporal
    positions (tiny: (B, M, t) @ (B, t, 4)) and the rectangle test is
    elementwise arithmetic that fuses into neighboring work.
    """
    P, s = patches_per_side, patch_size
    B, T = boxes.shape[:2]
    t = T // tubelet_size
    t_idx = token_idx // (P * P)
    rem = token_idx % (P * P)
    j = rem // P  # patch row
    k = rem % P  # patch col
    row_lo = (j * s).astype(jnp.float32)
    col_lo = (k * s).astype(jnp.float32)
    row_hi = row_lo + s
    col_hi = col_lo + s
    # exact one-hot selection of each token's temporal position: every
    # product is x*1 or x*0, so f32 accumulation is bit-exact
    onehot = (
        t_idx[..., None] == jnp.arange(t)[None, None, :]
    ).astype(jnp.float32)  # (B, M, t)
    in_any = jnp.zeros(token_idx.shape, bool)
    for r in range(tubelet_size):
        frame_boxes = boxes[:, r::tubelet_size][:, :t].astype(jnp.float32)
        sel = jnp.einsum(
            "bmt,btc->bmc", onehot, frame_boxes,
            preferred_element_type=jnp.float32,
        )  # (B, M, 4)
        x1, y1, x2, y2 = (sel[..., c] for c in range(4))
        inside = (
            (x1 < col_hi) & (x2 > col_lo) & (y1 < row_hi) & (y2 > row_lo)
        )  # the 'paint' half-open rasterization (box_to_patch_map)
        in_any = in_any | inside
    return in_any


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _make_gather_rows(n: int):
    """Row gather with a one-hot-matmul backward, specialized on N
    (custom_vjp residuals must be arrays, so N rides the closure)."""

    @jax.custom_vjp
    def g(tokens, idx):
        return jnp.take_along_axis(tokens, idx[..., None], axis=1)

    def fwd(tokens, idx):
        return g(tokens, idx), idx

    def bwd(idx, dy):
        # exact: per-row indices are unique, so each token row receives
        # at most one contribution — no accumulation collisions
        onehot = jax.nn.one_hot(idx, n, dtype=dy.dtype)
        dtokens = jnp.einsum(
            "bmn,bmd->bnd", onehot, dy, preferred_element_type=dy.dtype
        )
        return dtokens, None

    g.defvjp(fwd, bwd)
    return g


def _gather_rows_onehot_bwd(tokens: Array, idx: Array) -> Array:
    return _make_gather_rows(tokens.shape[1])(tokens, idx)


def gather_tokens(tokens: Array, idx: Array) -> Array:
    """Gradient-path token selection: tokens (B, N, D), idx (B, M) ->
    (B, M, D).

    On TPU: take_along_axis FORWARD (a row gather — 7680 x 1.5 KB rows at
    the encoder geometry, ~0.1 ms) with a one-hot-matmul BACKWARD via
    custom_vjp. The natural pairings are both slower: gather fwd + XLA
    scatter-add bwd (scatters serialize / can hang Mosaic-era compiles),
    and one-hot fwd + one-hot bwd (the fwd einsum measured 1.64 ms at the
    (48, 160, 1568, 768) geometry — 18x its flop floor). Elsewhere
    (frozen positional tables, stop-gradient targets) plain gathers stay.
    """
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return jnp.take_along_axis(tokens, idx[..., None], axis=1)
    return _gather_rows_onehot_bwd(tokens, idx)


def mask_to_indices(mask: Array, num_masked: int) -> Tuple[Array, Array]:
    """Split a boolean mask (B, N) into (visible_idx, masked_idx) with
    static shapes (B, N - num_masked) and (B, num_masked).

    Positions keep ascending order within each group — identical to the
    reference's boolean indexing x[~mask] / x[mask] (modeling_pretrain.py:
    90, 261-262). Requires every row to contain exactly `num_masked` True
    entries (guaranteed by the generators above).
    """
    n = mask.shape[-1]
    # non-minor-axis sort: see _rank_small for why
    order = jnp.argsort(
        mask.astype(jnp.int32).T, axis=0, stable=True
    ).T
    vis_idx = order[:, : n - num_masked]
    masked_idx = order[:, n - num_masked :]
    # argsort(stable) puts False (0) first in ascending position order; the
    # True block is likewise ascending.
    return vis_idx, masked_idx


# --------------------------------------------------------------------------
# Numpy parity generators — host-side, reproduce the reference RNG call
# sequence exactly for bit-parity testing
# --------------------------------------------------------------------------


class TubeMaskingGeneratorNumpy:
    """Host-side generator consuming np.random exactly like the reference
    TubeMaskingGenerator (one np.random.shuffle of a 0/1 row per call)."""

    def __init__(self, input_size, mask_ratio):
        self.frames, self.height, self.width = input_size
        self.patches_per_frame = self.height * self.width
        self.num_masks_per_frame = int(mask_ratio * self.patches_per_frame)
        self.total_patches = self.frames * self.patches_per_frame
        self.total_masks = self.frames * self.num_masks_per_frame

    def __call__(self) -> np.ndarray:
        row = np.hstack(
            [
                np.zeros(self.patches_per_frame - self.num_masks_per_frame),
                np.ones(self.num_masks_per_frame),
            ]
        )
        np.random.shuffle(row)
        return np.tile(row, (self.frames, 1)).flatten()


class MotionTubeMaskingGeneratorNumpy:
    """Host-side BB-biased generator. bug_compat=True consumes np.random in
    the same call sequence as the reference TubeMaskingGenerator_BB
    (shuffle of the python index list, then shuffle of the setdiff array)."""

    def __init__(
        self,
        input_size,
        mask_ratio,
        mask_ratio_bb,
        patch_size: int = 16,
        bug_compat: bool = True,
    ):
        self.frames, self.height, self.width = input_size
        self.patches_per_frame = self.height * self.width
        self.num_masks_per_frame = int(mask_ratio * self.patches_per_frame)
        self.mask_ratio_bb = mask_ratio_bb
        self.patch_size = patch_size
        self.bug_compat = bug_compat

    def _inside_indices(self, box) -> list:
        s = self.patch_size
        x1, y1, x2, y2 = (float(v) for v in box)
        idx = []
        for j in range(self.height):
            for k in range(self.width):
                row_lo, row_hi = j * s, j * s + s
                col_lo, col_hi = k * s, k * s + s
                if self.bug_compat:
                    row_dis = x1 > row_hi or x2 < row_lo
                    col_dis = y1 > col_hi or y2 < col_lo
                    hit = not (row_dis and col_dis)
                else:
                    hit = (
                        x2 > x1
                        and y2 > y1
                        and x1 <= col_hi
                        and x2 >= col_lo
                        and y1 <= row_hi
                        and y2 >= row_lo
                    )
                if hit:
                    idx.append(j * self.width + k)
        return idx

    def __call__(self, boxes: np.ndarray) -> np.ndarray:
        inside = self._inside_indices(boxes[0])
        frame = np.zeros(self.patches_per_frame)
        np.random.shuffle(inside)
        cap = min(
            self.num_masks_per_frame, int(len(inside) * self.mask_ratio_bb)
        )
        selected = inside[:cap]
        frame[selected] = 1

        n_fill = self.num_masks_per_frame - len(selected)
        if self.bug_compat:
            pool = np.setdiff1d(np.arange(self.num_masks_per_frame), selected)
        else:
            pool = np.setdiff1d(np.arange(self.patches_per_frame), selected)
        np.random.shuffle(pool)
        frame[pool[:n_fill]] = 1
        return np.tile(frame, (self.frames, 1)).flatten()
