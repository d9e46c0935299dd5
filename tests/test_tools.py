"""Smoke tests for the perf toolkit parsers (tools/parse_trace.py,
tools/attribute_trace.py) on synthetic trace + HLO fixtures, so the
profiling workflow documented in docs/PERF.md can't silently bitrot.
"""

import gzip
import json
import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.fixture()
def fake_trace(tmp_path):
    root = tmp_path / "trace" / "plugins" / "profile" / "2026_01_01"
    root.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "jit_step", "dur": 1000.0,
         "ts": 0},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 600.0, "ts": 0},
        {"ph": "X", "pid": 3, "name": "attn.1", "dur": 300.0, "ts": 600},
        {"ph": "X", "pid": 9, "name": "host_thing", "dur": 99.0, "ts": 0},
    ]
    p = root / "vm.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path / "trace")


@pytest.fixture()
def fake_hlo(tmp_path):
    p = tmp_path / "hlo.txt"
    p.write_text(
        '  %fusion.1 = bf16[8,8]{1,0} fusion(%p0), kind=kLoop, '
        'metadata={op_name="jit(step)/jvp(Model)/decoder/blocks_0/mlp/'
        'fc1/dot_general"}\n'
        '  %attn.1 = bf16[8,8]{1,0} custom-call(%p1), '
        'metadata={op_name="jit(step)/jvp(Model)/decoder/blocks_0/attn/'
        'pallas_call"}\n'
    )
    return str(p)


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(TOOLS, script), *args],
        capture_output=True, text=True, timeout=120,
    )


class TestParseTrace:
    def test_aggregates_device_ops(self, fake_trace):
        r = _run("parse_trace.py", fake_trace, "10")
        assert r.returncode == 0, r.stderr
        assert "fusion.1" in r.stdout
        assert "0.600 ms" in r.stdout
        assert "host_thing" not in r.stdout  # host pid excluded

    def test_missing_dir_errors(self, tmp_path):
        r = _run("parse_trace.py", str(tmp_path / "nope"))
        assert r.returncode != 0


class TestAttributeTrace:
    def test_buckets_by_metadata(self, fake_trace, fake_hlo):
        r = _run("attribute_trace.py", fake_trace, fake_hlo, "1")
        assert r.returncode == 0, r.stderr
        assert "decoder blocks" in r.stdout
        assert "flash-attn custom calls" in r.stdout
        # the jit_step program span must not count as an op
        assert "jit_step" not in r.stdout.split("buckets")[1]
