"""EPIC-KITCHENS offline preprocessing (factory/epic_segments.py):
action-segment cutting + GT hand-object conversion on synthetic
fixtures — the raw-EPIC-to-training-layout path end to end.

Reference behaviors covered:
  scripts/data/Epic-kitchen/Preprocess_epic_data.py:146-148 (+1 frame
  filename offset, inclusive stop_frame, video_{row}.MP4 naming,
  skip-if-exists resume);
  Preprocess_epic_annot.py:113-141 ([start:stop] slice, per-frame
  hands/objects box lists, detection_{row} naming).
"""

import csv
import json
import os
import pickle

import numpy as np
import pytest

from mofo_tpu.factory import epic_segments as es

CSV_FIELDS = [
    "narration_id", "participant_id", "video_id", "narration_timestamp",
    "start_timestamp", "stop_timestamp", "start_frame", "stop_frame",
    "narration", "verb", "verb_class", "noun", "noun_class",
]


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        w.writeheader()
        for r in rows:
            full = {k: "" for k in CSV_FIELDS}
            full.update(r)
            w.writerow(full)


def _epic_fixture(tmp_path, n_frames=8):
    """Frame-dump layout + a 2-action csv. Frame k's pixels encode k so
    the cut videos can be checked frame by frame."""
    cv2 = pytest.importorskip("cv2")
    vid_dir = tmp_path / "P01" / "rgb_frames" / "P01_01"
    vid_dir.mkdir(parents=True)
    for k in range(n_frames):
        img = np.full((32, 48, 3), k * 10 + 5, np.uint8)
        cv2.imwrite(str(vid_dir / "frame_{:010d}.jpg".format(k + 1)), img)
    csv_path = tmp_path / "EPIC_100_train.csv"
    _write_csv(csv_path, [
        {"narration_id": "P01_01_0", "participant_id": "P01",
         "video_id": "P01_01", "start_frame": 0, "stop_frame": 2,
         "verb_class": 1, "noun_class": 2},
        {"narration_id": "P01_01_1", "participant_id": "P01",
         "video_id": "P01_01", "start_frame": 4, "stop_frame": 6,
         "verb_class": 3, "noun_class": 4},
    ])
    return csv_path


class TestCutSegments:
    def test_cut_and_readback(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        csv_path = _epic_fixture(tmp_path)
        out = tmp_path / "EPIC_100_train"
        counts = es.cut_action_segments(
            str(csv_path), str(tmp_path), str(out)
        )
        assert counts == {"ok": 2}
        # row 0: frames 0..2 inclusive -> files frame_0000000001..3
        cap = cv2.VideoCapture(str(out / "video_0.MP4"))
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        cap.release()
        assert len(frames) == 3
        # mp4v is lossy; the flat-gray payload survives within a few DN
        for k, frame in enumerate(frames):
            assert abs(float(frame.mean()) - (k * 10 + 5)) <= 8

    def test_resume_and_dry_run(self, tmp_path):
        csv_path = _epic_fixture(tmp_path)
        out = tmp_path / "EPIC_100_train"
        assert es.cut_action_segments(
            str(csv_path), str(tmp_path), str(out), dry_run=True
        ) == {"planned": 2}
        assert not out.exists()  # dry run writes nothing
        es.cut_action_segments(str(csv_path), str(tmp_path), str(out))
        assert es.cut_action_segments(
            str(csv_path), str(tmp_path), str(out)
        ) == {"exists": 2}

    def test_missing_frames_reported(self, tmp_path):
        csv_path = _epic_fixture(tmp_path)
        _write_csv(csv_path, [
            {"participant_id": "P01", "video_id": "P01_01",
             "start_frame": 5, "stop_frame": 99},
        ])
        counts = es.cut_action_segments(
            str(csv_path), str(tmp_path), str(tmp_path / "out")
        )
        assert counts == {"missing": 1}


class _Bbox:
    def __init__(self, l, t, r, b):
        self.left, self.top, self.right, self.bottom = l, t, r, b


class _Det:
    def __init__(self, bbox):
        self.bbox = bbox


class _FrameDet:
    """Duck-typed FrameDetections (what epic_kitchens unpickles)."""

    def __init__(self, hands, objects):
        self.hands = [_Det(_Bbox(*h)) for h in hands]
        self.objects = [_Det(_Bbox(*o)) for o in objects]


def _hoa_fixture(tmp_path, schema="dict"):
    """Per-video hoa pickle (6 frames) + a 1-action csv [1:4)."""
    frames = []
    for k in range(6):
        hands = [[k, k, k + 10, k + 10]]
        objects = [[k + 1, k + 1, k + 5, k + 5]] if k % 2 == 0 else []
        if schema == "dict":
            frames.append({"hands": hands, "objects": objects})
        else:
            frames.append(_FrameDet(hands, objects))
    annot = tmp_path / "hand-objects" / "P01"
    annot.mkdir(parents=True)
    with open(annot / "P01_01.pkl", "wb") as f:
        pickle.dump(frames, f)
    csv_path = tmp_path / "EPIC_100_train.csv"
    _write_csv(csv_path, [
        {"participant_id": "P01", "video_id": "P01_01",
         "start_frame": 1, "stop_frame": 4},
    ])
    return csv_path


class TestHoaConvert:
    @pytest.mark.parametrize("schema", ["dict", "object"])
    def test_convert(self, tmp_path, schema):
        csv_path = _hoa_fixture(tmp_path, schema)
        out = tmp_path / "hoa_out"
        counts = es.convert_hoa_detections(
            str(csv_path), str(tmp_path / "hand-objects"), str(out)
        )
        assert counts == {"ok": 1}
        with open(out / "detection_0.json") as f:
            data = json.load(f)
        # frames [1, 4): k = 1, 2, 3
        assert data["hands"] == [
            [[1, 1, 11, 11]], [[2, 2, 12, 12]], [[3, 3, 13, 13]]
        ]
        assert data["objects"] == [[], [[3, 3, 7, 7]], []]

    def test_merged_bb_json_feeds_motion_box_index(self, tmp_path):
        from mofo_tpu.data.filelist import MotionBoxIndex

        csv_path = _hoa_fixture(tmp_path)
        merged = tmp_path / "Unsupervised_BB_EK_train.json"
        es.convert_hoa_detections(
            str(csv_path), str(tmp_path / "hand-objects"),
            str(tmp_path / "hoa_out"), merged_json=str(merged),
        )
        idx = MotionBoxIndex.from_file(str(merged))
        boxes = idx.get("video_0", [0, 1, 2])
        # frame k=1: hand [1,1,11,11], no object -> union = hand box
        np.testing.assert_allclose(boxes[0], [1, 1, 11, 11])
        # frame k=2: hand [2,2,12,12] U object [3,3,7,7]
        np.testing.assert_allclose(boxes[1], [2, 2, 12, 12])
        # out-of-range frame -> empty box
        np.testing.assert_allclose(
            idx.get("video_0", [99])[0], [0, 0, 1, 1]
        )

    def test_union_box_empty(self):
        assert es.union_box([]) == [0.0, 0.0, 1.0, 1.0]
        assert es.union_box(
            [[1, 2, 3, 4], [0, 5, 9, 2]]
        ) == [0, 2, 9, 4]


class TestCli:
    def test_cli_cut_dry_run(self, tmp_path, capsys):
        from mofo_tpu.cli import epic_preprocess

        csv_path = _epic_fixture(tmp_path)
        args = epic_preprocess.get_args([
            "cut", "--csv", str(csv_path), "--frames_root",
            str(tmp_path), "--out", str(tmp_path / "o"), "--dry_run",
        ])
        counts = epic_preprocess.main(args)
        assert counts == {"planned": 2}
        assert json.loads(capsys.readouterr().out)["cmd"] == "cut"

    def test_cli_hoa(self, tmp_path):
        from mofo_tpu.cli import epic_preprocess

        csv_path = _hoa_fixture(tmp_path)
        args = epic_preprocess.get_args([
            "hoa", "--csv", str(csv_path), "--annot_root",
            str(tmp_path / "hand-objects"), "--out",
            str(tmp_path / "hoa_out"),
        ])
        assert epic_preprocess.main(args) == {"ok": 1}
