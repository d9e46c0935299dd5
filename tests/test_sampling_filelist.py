"""Frame samplers and file-list parsing: transcription parity with the
reference arithmetic."""

import json

import numpy as np

from mofo_tpu.data import filelist, sampling


class TestTSN:
    def test_pin_seed_reproduces_reference_quirk(self):
        # reference seeds np.random with 10 per call (kinetics.py:520):
        # identical durations => identical ids
        a = sampling.tsn_frame_ids(300, pin_seed=True)
        b = sampling.tsn_frame_ids(300, pin_seed=True)
        np.testing.assert_array_equal(a, b)
        assert len(a) == 16  # skip_length 32 / new_step 2

    def test_matches_reference_transcription(self):
        # direct transcription of kinetics.py:518-555 for a given rng state
        num_frames, num_segments, skip_length, new_step = 250, 1, 32, 2
        np.random.seed(10)
        average_duration = (num_frames - skip_length + 1) // num_segments
        offsets = np.multiply(
            list(range(num_segments)), average_duration
        ) + np.random.randint(average_duration, size=num_segments)
        offsets = offsets + 1
        skip_offsets = np.zeros(skip_length // new_step, dtype=int)
        ref_ids = []
        for seg_ind in offsets:
            offset = int(seg_ind)
            for i, _ in enumerate(range(0, skip_length, new_step)):
                if offset + skip_offsets[i] <= num_frames:
                    ref_ids.append(offset + skip_offsets[i] - 1)
                else:
                    ref_ids.append(offset - 1)
                if offset + new_step < num_frames:
                    offset += new_step
        ours = sampling.tsn_frame_ids(num_frames, pin_seed=True)
        np.testing.assert_array_equal(ours, ref_ids)

    def test_short_video(self):
        ids = sampling.tsn_frame_ids(8, rng=np.random.RandomState(0))
        assert len(ids) == 16
        assert (ids >= 0).all() and (ids < 8).all()

    def test_boundary_durations_pin_reference_walk(self):
        # durations around skip_length (31/32/33) exercise the decode
        # walk's `offset + new_step < duration` advance guard and the
        # `offset + skip_offsets[i] <= duration` clamp exactly where an
        # off-by-one would flip them (kinetics.py:543-555)
        for num_frames in (31, 32, 33, 34):
            np.random.seed(10)
            skip_length, new_step = 32, 2
            average_duration = num_frames - skip_length + 1
            if average_duration > 0:
                offsets = np.array([0]) + np.random.randint(
                    average_duration, size=1)
            else:
                offsets = np.zeros((1,))
            offsets = offsets + 1
            ref_ids = []
            offset = int(offsets[0])
            for _ in range(0, skip_length, new_step):
                if offset <= num_frames:  # skip_offsets are zeros
                    ref_ids.append(offset - 1)
                else:
                    ref_ids.append(offset - 1)
                if offset + new_step < num_frames:
                    offset += new_step
            ours = sampling.tsn_frame_ids(num_frames, pin_seed=True)
            np.testing.assert_array_equal(ours, ref_ids, err_msg=str(
                num_frames))
            assert (ours >= 0).all() and (ours < num_frames).all()

    def test_stride_2(self):
        ids = sampling.tsn_frame_ids(300, rng=np.random.RandomState(0))
        diffs = np.diff(ids)
        assert (diffs == 2).all()


class TestDense:
    def test_train_clip_bounds(self):
        ids = sampling.dense_train_indices(
            300, clip_len=16, frame_sample_rate=4,
            rng=np.random.RandomState(0))
        assert len(ids) == 16
        assert (ids >= 0).all() and (ids < 300).all()
        span = ids.max() - ids.min()
        assert span <= 16 * 4

    def test_short_video_pads(self):
        ids = sampling.dense_train_indices(
            20, clip_len=16, frame_sample_rate=4,
            rng=np.random.RandomState(0))
        assert len(ids) == 16
        assert (ids < 20).all()

    def test_test_indices(self):
        ids = sampling.dense_test_indices(10, clip_len=16,
                                          frame_sample_rate=4)
        assert len(ids) == 16
        np.testing.assert_array_equal(ids[:3], [0, 4, 8])
        assert (ids[3:] == 8).all()


class TestUniform:
    def test_train(self):
        ids = sampling.uniform_train_indices(
            160, num_segment=16, rng=np.random.RandomState(0))
        assert len(ids) == 16
        # one index per segment of length 10
        assert ((ids // 10) == np.arange(16)).all()

    def test_test_grid_matches_reference(self):
        num_frames, num_segment = 100, 16
        tick = num_frames / float(num_segment)
        ref = sorted(
            [int(tick / 2.0 + tick * x) for x in range(num_segment)]
            + [int(tick * x) for x in range(num_segment)]
        )
        ours = sampling.uniform_test_indices(num_frames,
                                             num_segment=num_segment)
        np.testing.assert_array_equal(ours, ref)


class TestTimestamp:
    def test_matches_reference_formula(self):
        ids = sampling.timestamp_frame_ids(100, 200, num_segments=16,
                                           jitter=False)
        ref = np.convolve(
            np.linspace(100, 200, 17), [0.5, 0.5], mode="valid"
        ).astype(int)
        np.testing.assert_array_equal(ids, ref)

    def test_jitter_stays_roughly_in_window(self):
        ids = sampling.timestamp_frame_ids(
            100, 200, num_segments=16, jitter=True,
            rng=np.random.RandomState(0))
        assert (ids >= 95).all() and (ids <= 205).all()


class TestFileList:
    def test_setting_file(self, tmp_path):
        p = tmp_path / "train.csv"
        p.write_text("/data/a.mp4 0\n/data/b.mp4 17\n\n")
        clips = filelist.read_setting_file(str(p))
        assert [(c.path, c.label) for c in clips] == [
            ("/data/a.mp4", 0), ("/data/b.mp4", 17)]

    def test_setting_file_with_duration_column(self, tmp_path):
        p = tmp_path / "train.csv"
        p.write_text("/data/a.mp4 300 5\n")
        clips = filelist.read_setting_file(str(p))
        assert clips[0].label == 5  # label is the LAST field

    def test_epic_csv(self, tmp_path):
        header = ",".join([f"c{i}" for i in range(15)])
        row = ["0", "P01", "P01_01", "narr", "00:00:01.00",
               "00:00:03.00", "x", "x", "take plate", "x", "2", "x",
               "7", "x", "x"]
        p = tmp_path / "EPIC_100_train.csv"
        p.write_text(header + "\n" + ",".join(row) + "\n")
        entries = filelist.read_epic_csv(str(p))
        e = entries[0]
        assert (e.verb, e.noun, e.narration) == (2, 7, "take plate")
        assert filelist.datetime2sec(e.start_timestamp) == 1.0

    def test_motion_box_index(self):
        data = {
            "vid1": [
                {"labels": [{"box2d": {"x1": 1, "y1": 2, "x2": 30,
                                       "y2": 40},
                             "gt_annotation": "union"}]},
                {"labels": []},
            ]
        }
        idx = filelist.MotionBoxIndex(data)
        boxes = idx.get("vid1", [0, 1, 5])
        np.testing.assert_allclose(boxes[0], [1, 2, 30, 40])
        np.testing.assert_allclose(boxes[1], [0, 0, 1, 1])  # empty
        np.testing.assert_allclose(boxes[2], [0, 0, 1, 1])  # out of range
        assert filelist.MotionBoxIndex.video_key("/a/b/vid1.mp4") == "vid1"
        union = idx.union_box("vid1", [0, 1])
        np.testing.assert_allclose(union, [0, 0, 30, 40])
