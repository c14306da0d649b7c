"""r12 plan audit: explain() every registered query and tabulate the plan
shape — Exchange count, range-partitioning sorts, join strategies, Python
eval nodes, cartesian products — so plan antipatterns outside the headline
bench are visible in one artifact.

Usage: python tools/plan_audit.py [--out plans/r12/plan_audit.json]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ror_etl_spark import registry  # noqa: E402
from ror_etl_spark.session import get_spark  # noqa: E402


def stats(plan: str) -> dict:
    # explain("formatted"): tree nodes render as "OpName (n)" and each
    # operator's detail block header as "(n) OpName"; Exchange partitioning
    # lives in the detail block's "Arguments: hashpartitioning(...)" line.
    def op(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.M))

    n_exch = op("Exchange")
    hash_p = len(re.findall(r"^Arguments: hashpartitioning", plan, re.M))
    range_p = len(re.findall(r"^Arguments: rangepartitioning", plan, re.M))
    single_p = len(re.findall(r"^Arguments: SinglePartition", plan, re.M))
    return {
        "exchanges": n_exch,
        "hash_exchanges": hash_p,
        "range_exchanges": range_p,
        "single_exchanges": single_p,
        "broadcasts": op("BroadcastExchange"),
        "reused": op("ReusedExchange"),
        "smj": op("SortMergeJoin"),
        "bhj": op("BroadcastHashJoin"),
        "shj": op("ShuffledHashJoin"),
        "bnlj": op("BroadcastNestedLoopJoin"),
        "cartesian": op("CartesianProduct"),
        "batch_eval_python": op("BatchEvalPython"),
        "arrow_eval_python": op("ArrowEvalPython"),
        "map_in_pandas": op("MapInPandas") + op("MapInArrow") + op("FlatMapGroupsInPandas"),
        "windows": op("Window") + op("WindowGroupLimit"),
        "sorts": op("Sort"),
        "take_ordered": op("TakeOrderedAndProject"),
        "scans_rdd": op("Scan ExistingRDD"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="plans/r12/plan_audit.json")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("plan_audit")
    spark.conf.set("spark.ror.ordered.checkpoint", "false")
    out: dict[str, dict] = {}
    for name in sorted(registry.QUERIES):
        t0 = time.perf_counter()
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            rec = stats(buf.getvalue())
            rec["build_s"] = round(time.perf_counter() - t0, 2)
            out[name] = rec
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, json.dumps(out[name]), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out} ({len(out)} queries)")


if __name__ == "__main__":
    main()
