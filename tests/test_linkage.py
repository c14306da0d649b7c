"""Independent-reference tests for the linkage/SCD2/EWMA operators
(queries/linkage.py). The driver gate hash-checks these against DuckDB;
here we pin the properties a consistently-wrong-on-both-sides
implementation would still violate: SymSpell completeness vs a Python
brute force, SCD2 interval chaining, and the EWMA closed form vs numpy.
"""

from __future__ import annotations

from ror_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_symspell_matches_python_brute_force(spark):
    out = {
        (r["tok_a"], r["tok_b"]): r["dist"]
        for r in QUERIES["fuzzy_token_symspell"](spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    vocab = sorted(
        {
            t
            for (txt,) in docs.select("text").collect()
            for t in " ".join(txt.lower().split()).split(" ")
            if t
        }
    )
    brute = {
        (a, b): _lev(a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if _lev(a, b) <= 2
    }
    assert out == brute and len(brute) > 0


def test_symspell_neighborhood_catches_transpositions(spark):
    # "ab" vs "ba" share no 1-deletion variant yet lev=2 — the 2-deletion
    # neighborhood must surface the pair; a 1-deletion-only candidate
    # generator silently drops transposition-shaped pairs.
    import pyspark.sql.functions as F

    from ror_etl_spark.queries import linkage

    df = spark.createDataFrame([("ab ba xy yx",)], "text string")
    df.createOrReplaceTempView("_t")
    toks = ["ab", "ba", "xy", "yx"]
    d1 = linkage._DELS.format(t="tok")
    d2 = linkage._DELS.format(t="s")
    variants = (
        spark.createDataFrame([(t,) for t in toks], "tok string")
        .select(
            "tok",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"concat(array(tok), {d1}, flatten(transform({d1}, s -> {d2})))"
                    )
                )
            ).alias("v"),
        )
    )
    a, b = variants.alias("a"), variants.alias("b")
    pairs = {
        (r["ta"], r["tb"])
        for r in a.join(b, F.col("a.v") == F.col("b.v"))
        .where(F.col("a.tok") < F.col("b.tok"))
        .select(F.col("a.tok").alias("ta"), F.col("b.tok").alias("tb"))
        .distinct()
        .collect()
    }
    assert ("ab", "ba") in pairs and ("xy", "yx") in pairs


def test_scd2_intervals_chain_per_customer(spark):
    rows = QUERIES["scd2_order_status_history"](spark, SF_SMALL).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["c_custkey"], []).append(r)
    assert by_cust
    saw_multi = False
    for hist in by_cust.values():
        hist.sort(key=lambda r: r["valid_from"])
        # exactly one open row, and it is the last one
        opens = [r for r in hist if r["is_current"]]
        assert len(opens) == 1 and hist[-1]["is_current"]
        assert hist[0]["status"] == "NEW"
        for prev, nxt in zip(hist, hist[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
        if len(hist) > 2:
            saw_multi = True
    assert saw_multi  # data actually exercises the chaining path


def test_ewma_matches_numpy_closed_form(spark):
    import numpy as np

    rows = QUERIES["ewma_daily_revenue"](spark, SF_SMALL).collect()
    days = np.array([np.datetime64(r["day"]) for r in rows])
    rev = np.array([r["revenue"] for r in rows])
    for idx in (0, 1, len(rows) // 2, len(rows) - 1):
        d = days[idx]
        lag = (d - days).astype("timedelta64[D]").astype(int)
        m = (lag >= 0) & (lag <= 29)
        w = 0.7 ** lag[m]
        expect = float((rev[m] * w).sum() / w.sum())
        assert abs(rows[idx]["ewma30"] - expect) < 0.05
