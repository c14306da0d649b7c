"""Snapshot the parquet schemas of the driver-generated testdata.

The driver regenerates /root/testdata between rounds and has already
drifted column types once (round 4: events.ts flipped parquet type and
crashed every events query until diagnosed by hand).  This tool freezes
the schema the repo was validated against into a committed JSON snapshot;
``tests/test_schema_drift.py`` compares the live testdata against it at
the start of every pytest run so a drift next round is a single loud
test signal instead of a cascade of opaque query failures.

Usage:
    python tools/dump_schemas.py            # rewrite tools/testdata_schemas.json
    python tools/dump_schemas.py --check    # exit 1 on drift, print diff
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import pyarrow.parquet as pq

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata_schemas.json")
TESTDATA_ROOT = "/root/testdata"


def live_schemas(root: str = TESTDATA_ROOT) -> dict:
    """{sf_dir_name: {table: {col: arrow_type_str}}} for every sf tier on disk."""
    out: dict = {}
    for sf_dir in sorted(glob.glob(os.path.join(root, "sf*"))):
        tier = {}
        for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            schema = pq.read_schema(f)
            tier[os.path.basename(f).removesuffix(".parquet")] = {
                name: str(typ) for name, typ in zip(schema.names, schema.types)
            }
        out[os.path.basename(sf_dir)] = tier
    return out


def diff(expected: dict, actual: dict) -> list[str]:
    """Human-readable drift lines; empty list means no drift."""
    lines: list[str] = []
    for sf in sorted(set(expected) | set(actual)):
        e_tier, a_tier = expected.get(sf), actual.get(sf)
        if e_tier is None:
            lines.append(f"{sf}: new tier on disk (not in snapshot)")
            continue
        if a_tier is None:
            lines.append(f"{sf}: tier missing on disk")
            continue
        for tbl in sorted(set(e_tier) | set(a_tier)):
            e_cols, a_cols = e_tier.get(tbl), a_tier.get(tbl)
            if e_cols is None:
                lines.append(f"{sf}/{tbl}: new table on disk")
                continue
            if a_cols is None:
                lines.append(f"{sf}/{tbl}: table missing on disk")
                continue
            for col in sorted(set(e_cols) | set(a_cols)):
                e_t, a_t = e_cols.get(col), a_cols.get(col)
                if e_t != a_t:
                    lines.append(f"{sf}/{tbl}.{col}: snapshot={e_t!r} live={a_t!r}")
    return lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="compare instead of rewrite")
    ap.add_argument("--root", default=TESTDATA_ROOT)
    args = ap.parse_args()

    actual = live_schemas(args.root)
    if args.check:
        with open(SNAPSHOT) as f:
            expected = json.load(f)
        lines = diff(expected, actual)
        if lines:
            print("TESTDATA SCHEMA DRIFT DETECTED:")
            for ln in lines:
                print("  " + ln)
            return 1
        print("testdata schemas match snapshot")
        return 0

    with open(SNAPSHOT, "w") as f:
        json.dump(actual, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {SNAPSHOT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
