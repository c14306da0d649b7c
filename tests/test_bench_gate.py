"""Pin the bench quiet-gate floor scan (VERDICT r10 "What's wrong").

The r10 fix read ``rec["cpu_ref_s"]`` at top level, but every
driver-written BENCH_r*.json nests bench.py's JSON line under
``"parsed"`` — so the floor was always None and the adaptive gate was
inert. These tests feed the scan both artifact shapes, including a
replica of the actual driver layout, so the regression can't reappear.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import scan_cpu_ref_floor


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_floor_reads_driver_shaped_nested_artifact(tmp_path):
    """The shape the external driver actually writes: bench.py's JSON
    line parsed under "parsed", wrapper keys (cpus/n/rc/sf/tail) at top
    level, NO top-level cpu_ref_s."""
    _write(
        tmp_path,
        "BENCH_r01.json",
        {
            "cpus": 32,
            "n": 37,
            "rc": 0,
            "sf": 0.1,
            "tail": "…",
            "parsed": {
                "metric": "headline_total",
                "value": 36.6,
                "cpu_ref_s": 0.731,
            },
        },
    )
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"cpus": 32, "parsed": {"value": 33.1, "cpu_ref_s": 0.561}},
    )
    assert scan_cpu_ref_floor(str(tmp_path)) == 0.561


def test_floor_reads_top_level_and_prefers_minimum(tmp_path):
    """Locally-written artifacts put cpu_ref_s at top level; the scan
    must accept both shapes and take the min across all files."""
    _write(tmp_path, "BENCH_r01.json", {"cpu_ref_s": 0.9})
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"cpu_ref_s": 0.8}})
    assert scan_cpu_ref_floor(str(tmp_path)) == 0.8


def test_floor_skips_malformed_artifacts(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text("not json {")
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"cpu_ref_s": "nan?"}})
    _write(tmp_path, "BENCH_r03.json", {"parsed": {"value": 30.0}})
    _write(tmp_path, "BENCH_r04.json", {"parsed": {"cpu_ref_s": 0.77}})
    assert scan_cpu_ref_floor(str(tmp_path)) == 0.77


def test_floor_none_when_no_artifacts(tmp_path):
    assert scan_cpu_ref_floor(str(tmp_path)) is None


def test_floor_on_real_repo_artifacts_is_found():
    """On the actual repo the floor must resolve (10 driver artifacts
    exist, all nested) and sit in the plausible single-thread band —
    this is the exact call main() makes, so an inert gate would fail
    here, not silently pass."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    floor = scan_cpu_ref_floor(repo_root)
    assert floor is not None, "driver artifacts exist but floor scan found none"
    assert 0.3 < floor < 1.5
