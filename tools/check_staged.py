"""Driver-replica oracle check for a STAGED batch (pre-registration) at
any SF — the tri-SF evidence the staging discipline requires before a
flip. Same comparison as tools/check.py (strict columns + dtypes +
order-insensitive values), but sourced from a staged module's STAGED
dict instead of the live registry, so a pending batch can accumulate
sf0.01/sf0.1 evidence without touching the frozen registry. Usage:

    python tools/check_staged.py staged_r12 --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from ror_etl_spark.tables import TABLE_NAMES  # noqa: E402
from tools.check import df_key  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("module", help="staged module name, e.g. staged_r12")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    mod = importlib.import_module(f"ror_etl_spark.queries.{args.module}")
    staged = dict(mod.STAGED)
    names = sorted(staged)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(args.sf, t + '.parquet')}'"
        )

    n_pass = n_fail = 0
    for name in names:
        import gc as _gc

        spark.catalog.clearCache()
        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        fn, oracle = staged[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        try:
            odf = con.execute(oracle).df()
        except Exception:
            print(f"FAIL  {name}: oracle raised")
            traceback.print_exc()
            n_fail += 1
            continue
        scols, srows = df_key(sdf)
        ocols, orows = df_key(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        dt = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in scols
            if str(sdf[c].dtype) != str(odf[c].dtype)
        ]
        if dt:
            print(f"FAIL  {name}: dtype mismatch {dt}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if srows != orows:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
