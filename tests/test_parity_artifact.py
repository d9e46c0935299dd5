"""CI assertion of the recorded bit-parity artifact (reduced geometry).

Regenerates the seed-0 reference RNG outputs (numpy-twin mask indices,
pin-seed TSN frame ids) and the flax-vs-torch forward loss, and asserts
them against the checked-in golden (tests/golden/parity_seed0_reduced
.json, produced by tools/parity_artifact.py). Pins both reference parity
(abs_diff vs the float64 torch oracle) and regression (our own f32 loss
must not drift)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "parity_seed0_reduced.json"
)


def test_parity_artifact_reduced():
    import parity_artifact as PA

    golden = json.load(open(GOLDEN))

    masks = PA.mask_records(2, 2, 2)
    assert masks["tube_masked_idx"] == golden["masks"]["tube_masked_idx"]
    assert (
        masks["motion_masked_idx"]
        == golden["masks"]["motion_masked_idx"]
    )

    frames = PA.frame_records()
    for k, v in golden["tsn_frames_pin_seed"].items():
        assert frames[k] == v, k

    loss = PA.loss_record(full=False)
    # parity vs the float64 torch transcription
    assert loss["abs_diff"] < 1e-4, loss
    # regression pin on our own f32 loss
    np.testing.assert_allclose(
        loss["ours_loss_f32"],
        golden["forward_loss"]["ours_loss_f32"],
        rtol=1e-5,
    )
