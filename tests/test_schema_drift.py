"""Loud early-warning signal for driver testdata regeneration drift.

Round 4 lost time when the driver regenerated /root/testdata with a
different parquet type for events.ts and every events query crashed with
opaque errors.  This test compares the live testdata schemas against the
committed snapshot (tools/testdata_schemas.json, written by
``python tools/dump_schemas.py``) and fails with a per-column diff when
anything moved — making drift a one-test diagnosis.

On drift: read the diff, update the affected readers (tables.py adapts
events.ts dtype already), re-run the full sweep, then re-dump the
snapshot.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
SNAPSHOT = os.path.join(HERE, "..", "tools", "testdata_schemas.json")


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata"), reason="driver testdata not mounted"
)
def test_testdata_schemas_match_snapshot():
    import sys

    sys.path.insert(0, os.path.join(HERE, "..", "tools"))
    import dump_schemas

    with open(SNAPSHOT) as f:
        expected = json.load(f)
    lines = dump_schemas.diff(expected, dump_schemas.live_schemas())
    assert not lines, (
        "TESTDATA SCHEMA DRIFT — the driver regenerated /root/testdata with "
        "different schemas than this repo was validated against. Fix readers, "
        "run the full sweep, then `python tools/dump_schemas.py` to re-snapshot.\n"
        + "\n".join(lines)
    )
