"""Downloader plan construction + resume logic (offline --dry-run
surface of the reference's scripts/data downloaders)."""

import json
import os

from mofo_tpu.cli import download as D


class TestSSV2Plan:
    def test_shard_list(self, tmp_path):
        items = D.plan_ssv2(str(tmp_path))
        assert len(items) == 21
        names = [os.path.basename(i.output) for i in items]
        assert names[0] == "20bn-something-something-v2-00.zip"
        assert names[19] == "20bn-something-something-v2-19.zip"
        assert names[20].endswith("labels.zip")
        # qfile ids are contiguous 68975..68994 for the shards
        assert "/qfile/68975/" in items[0].url
        assert "/qfile/68994/" in items[19].url
        assert "/qfile/68943/" in items[20].url

    def test_cli_dry_run(self, tmp_path, capsys):
        rc = D.main(["ssv2", "--output", str(tmp_path), "--dry-run"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 22  # 21 items + assembly line
        assert json.loads(lines[0])["url"].startswith("https://")
        assert "post_download" in json.loads(lines[-1])


class TestEpicPlan:
    def test_epic55_vs_100_layout(self, tmp_path):
        items = D.plan_epic(
            ["P01_01", "P01_101"], str(tmp_path),
            what=["videos"], splits={"P01_01": "test"},
        )
        by_vid = {os.path.basename(i.output): i for i in items}
        v55 = by_vid["P01_01.MP4"]
        v100 = by_vid["P01_101.MP4"]
        # EPIC-55 remote tree is split-partitioned
        assert v55.url.endswith("/videos/test/P01/P01_01.MP4")
        assert D.EPIC_55_BASE in v55.url
        # extension videos live in the per-participant EPIC-100 tree
        assert v100.url.endswith("/P01/videos/P01_101.MP4")
        assert D.EPIC_100_BASE in v100.url
        # local layout is normalized to the EPIC-100 shape for both
        assert v55.output.endswith("EPIC-KITCHENS/P01/videos/P01_01.MP4")

    def test_masks_use_masks_base(self, tmp_path):
        (item,) = D.plan_epic(["P02_03"], str(tmp_path),
                              what=["hand_masks"])
        assert D.EPIC_MASKS_BASE in item.url
        assert item.url.endswith("/hand-objects/P02/P02_03.pkl")

    def test_errata_redirect(self, tmp_path):
        errata = {
            "videos/train/P01/P01_01.MP4": "https://dropbox/x.MP4"
        }
        (item,) = D.plan_epic(["P01_01"], str(tmp_path),
                              what=["videos"], errata=errata)
        assert item.url == "https://dropbox/x.MP4"

    def test_md5_attached(self, tmp_path):
        md5 = {"P01/videos/P01_101.MP4": "abc123"}
        (item,) = D.plan_epic(["P01_101"], str(tmp_path),
                              what=["videos"], md5=md5)
        assert item.md5 == "abc123"

    def test_participant_filter_cli(self, tmp_path, capsys):
        rc = D.main([
            "epic", "--output", str(tmp_path), "--dry-run",
            "--video-ids", "P01_101", "P02_101",
            "--participants", "P02",
        ])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 1 and "P02_101" in lines[0]


class TestResume:
    def test_already_done(self, tmp_path):
        p = tmp_path / "f.bin"
        item = D.Item("http://x", str(p))
        assert not D.already_done(item)
        p.write_bytes(b"data")
        assert D.already_done(item)
        # with a known md5, resume verifies the checksum
        good = D.Item("http://x", str(p), md5=D.file_md5(str(p)))
        bad = D.Item("http://x", str(p), md5="0" * 32)
        assert D.already_done(good)
        assert not D.already_done(bad)
