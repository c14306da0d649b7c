"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle side by side,
compares row count, column names/dtypes, and values (rows sorted, columns
sorted by name) and prints a per-query verdict. Use before committing new
queries:

    python tools/check.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from ror_etl_spark import registry  # noqa: E402
from ror_etl_spark.session import get_spark  # noqa: E402
from ror_etl_spark.tables import TABLE_NAMES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return repr(v)


def df_key(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--window", type=int, default=0,
                    help="check exactly the first N of registry.ordered_queries() "
                    "- the slice the external driver will record this round")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession (like the external driver) instead of get_spark()",
    )
    args = ap.parse_args()

    registry.load_all()
    if args.window:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        names = list(registry.ordered_queries(repo_root))[: args.window]
    else:
        names = sorted(registry.QUERIES)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(args.sf, t + '.parquet')}'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        # per-query isolation: minhash-family queries .cache() signature
        # frames and verify/CC stages localCheckpoint bounded frames;
        # across a multi-query endurance sweep in the vanilla session's
        # 1g default heap those accumulate and a broadcast build can OOM
        # (observed at sf0.1: dedup_exact_substring_spans failed in the
        # sweep, passed in isolation). The gate certifies per-query
        # correctness, so drop cached state between queries — clearCache
        # for CacheManager entries, then a Python+JVM GC so the
        # ContextCleaner reaps localCheckpoint RDD blocks whose Python
        # references the previous iteration just dropped.
        import gc as _gc

        spark.catalog.clearCache()
        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass  # connect-mode sessions have no _jvm; cache clear still ran
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        oracle = registry.ORACLES.get(name)
        if oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracle).df()
        except Exception:
            print(f"FAIL  {name}: oracle raised")
            traceback.print_exc()
            n_fail += 1
            continue
        # No dtype normalization: Spark toPandas yields datetime64[ns], so
        # every oracle casts its timestamp outputs to TIMESTAMP_NS — both
        # sides must agree natively or the query fails here, exactly as a
        # maximally strict external driver would see it.
        scols, srows = df_key(sdf)
        ocols, orows = df_key(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        dt_mismatch = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in scols
            if str(sdf[c].dtype) != str(odf[c].dtype)
        ]
        if dt_mismatch:
            # Fail, don't warn: the external driver's schema comparison may
            # be strict, so the local gate must be at least as strict.
            print(f"FAIL  {name}: dtype mismatch {dt_mismatch}")
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

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
