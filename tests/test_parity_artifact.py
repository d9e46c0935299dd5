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


CURVE_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "parity_curve_reduced.json"
)


import pytest  # noqa: E402


@pytest.mark.slow
def test_loss_curve_parity(tmp_path):
    """The north-star check: 25 FULL train steps (model fwd+bwd + AdamW
    with reference decay grouping + per-step reference-twin masks,
    jointly) must track the torch transcription of the reference engine
    mechanics at float64. Runs in a subprocess because it needs
    JAX_ENABLE_X64 (a startup flag)."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = tmp_path / "curve.json"
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "parity_artifact.py"),
         "--curve", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    curve = json.load(open(out))["loss_curve"]
    golden = json.load(open(CURVE_GOLDEN))["loss_curve"]
    # parity vs the torch reference engine at f64
    assert curve["max_rel_diff"] < 1e-6, curve["max_rel_diff"]
    # regression pins on both sides of the recorded golden curve
    np.testing.assert_allclose(
        curve["ours_losses"], golden["ours_losses"], rtol=1e-7
    )
    np.testing.assert_allclose(
        curve["torch_losses"], golden["torch_losses"], rtol=1e-7
    )
