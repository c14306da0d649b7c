"""Round-13 optimization measurement harness.

For each query: time DataFrame construction (Python+analysis), first noop
write (includes optimization+codegen), and best-of-N steady-state noop
writes; optionally dump .explain("formatted") to plans/r12/<name>_<tag>.txt.

Usage:
  python tools/measure_r12.py --tag before [--queries a,b,c] [--repeat 3]
                              [--plans] [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ror_etl_spark import registry  # noqa: E402
from ror_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    import bench

    registry.load_all()
    names = args.queries.split(",") if args.queries else list(bench.HEADLINE)

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("measure_r12", extra_conf=extra)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(repo, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    # warm up
    spark.read.parquet(os.path.join(args.sf_dir, "nation.parquet")).count()

    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.perf_counter() - t0
        best = None
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {
            "build_s": round(t_build, 3),
            "first_s": round(t_first, 3),
            "best_s": round(best, 3),
        }
        if args.plans:
            spark.conf.set("spark.ror.ordered.checkpoint", "false")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            spark.conf.set("spark.ror.ordered.checkpoint", "true")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)

    total_best = round(sum(v["best_s"] for v in out.values()), 3)
    print(json.dumps({"tag": args.tag, "total_best": total_best, "n": len(out)}))


if __name__ == "__main__":
    main()
