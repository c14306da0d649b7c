"""Storage-layout and retrieval-index mechanics: inverted-index build,
zone-map (data-skipping) effectiveness, and contrastive negative mining.

Three operators a training-data platform runs around its storage layer:

- **Inverted index build** — term -> (document frequency, collection
  frequency, first-k posting list). The posting list is capped BEFORE
  aggregation with a per-term window limit, so a stop word's postings
  never materialize corpus-sized state in one reducer — the classic
  inverted-index-on-MapReduce shape.
- **Zone-map pruning report** — models parquet/ORC file-level min-max
  statistics: shard the table under two candidate clustering layouts
  (ingest-time months vs value-bucketed price) and report what fraction
  of shards each predicate can skip under each layout. The point the
  report makes is the z-order one: skipping is a property of the
  LAYOUT-predicate pair, not of the statistics.
- **Contrastive negatives** — k deterministic pseudo-random negatives
  per anchor document for embedding-model training, via hash-offset
  block sampling on a hashed ring: rank documents by a portable hash,
  each anchor reads k consecutive ranks at a hash-derived offset. Two
  equi-joins, no cross join — the naive "k smallest h(anchor, cand)"
  spec is an N^2 join at corpus scale.

All oracles are exact-integer or fixed-rounded; the portable 52-bit
md5-prefix hash (queries/temporal.py:_kmv_hash) is the shared
deterministic randomness on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ror_etl_spark.queries.util import ordered
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

_TOKS_SQL = (
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
)


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    pairs AS (SELECT DISTINCT term, doc_id FROM occ),
    capped AS (
      SELECT term, doc_id FROM (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM pairs)
      WHERE rn <= 10),
    stats AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(count(*) AS BIGINT) AS cf
      FROM occ GROUP BY term),
    posting AS (
      SELECT term,
             array_to_string(list_sort(list(doc_id)), ',') AS postings_head
      FROM capped GROUP BY term)
    SELECT s.term, s.df, s.cf, p.postings_head
    FROM stats s JOIN posting p ON s.term = p.term
    WHERE s.term <> ''
    ORDER BY s.term
    """,
    priority=3,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed inverted-index build: per term, document frequency,
    collection frequency, and the first 10 postings (smallest doc ids).

    The posting head is capped with a per-term WindowGroupLimit BEFORE
    any collect — the full posting list of a stop word is corpus-sized
    and must never pass through one reducer as aggregate state; df/cf
    come from a separate count-only aggregate (longs, map-side partial).
    At 100 TB: one shuffle keyed by term for each aggregate, both with
    bounded per-group state; the two term-keyed frames join without a
    third shuffle under co-partitioning."""
    docs = Tables(spark, sf_dir).documents
    occ = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("term"),
    )
    pairs = occ.select("term", "doc_id").distinct()
    capped = (
        pairs.withColumn(
            "rn", F.row_number().over(W.partitionBy("term").orderBy("doc_id"))
        )
        .where(F.col("rn") <= 10)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    stats = occ.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("cf")
    )
    out = (
        stats.join(capped, "term")
        .where(F.col("term") != "")
        .select("term", "df", "cf", "postings_head")
    )
    return ordered(out, "term")


@query(
    "zone_map_pruning_report",
    oracle="""
    WITH by_month AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS shard,
             min(o_orderdate) AS dmin, max(o_orderdate) AS dmax,
             min(o_totalprice) AS pmin, max(o_totalprice) AS pmax,
             count(*) AS rows_in
      FROM orders GROUP BY 1),
    by_price AS (
      SELECT CAST(floor(o_totalprice / 18750.0) AS BIGINT) AS shard,
             min(o_orderdate) AS dmin, max(o_orderdate) AS dmax,
             min(o_totalprice) AS pmin, max(o_totalprice) AS pmax,
             count(*) AS rows_in
      FROM orders GROUP BY 1),
    m AS (
      SELECT 'month' AS layout, 'date_1996' AS predicate,
             count(*) AS n_shards,
             sum(CASE WHEN dmax < TIMESTAMP '1996-01-01'
                       OR dmin >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS n_pruned,
             sum(CASE WHEN dmax < TIMESTAMP '1996-01-01'
                       OR dmin >= TIMESTAMP '1997-01-01' THEN 0 ELSE rows_in END) AS rows_scanned,
             sum(rows_in) AS rows_total
      FROM by_month
      UNION ALL
      SELECT 'month', 'price_gt_400k', count(*),
             sum(CASE WHEN pmax <= 400000 THEN 1 ELSE 0 END),
             sum(CASE WHEN pmax <= 400000 THEN 0 ELSE rows_in END),
             sum(rows_in)
      FROM by_month
      UNION ALL
      SELECT 'price_bucket', 'date_1996', count(*),
             sum(CASE WHEN dmax < TIMESTAMP '1996-01-01'
                       OR dmin >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END),
             sum(CASE WHEN dmax < TIMESTAMP '1996-01-01'
                       OR dmin >= TIMESTAMP '1997-01-01' THEN 0 ELSE rows_in END),
             sum(rows_in)
      FROM by_price
      UNION ALL
      SELECT 'price_bucket', 'price_gt_400k', count(*),
             sum(CASE WHEN pmax <= 400000 THEN 1 ELSE 0 END),
             sum(CASE WHEN pmax <= 400000 THEN 0 ELSE rows_in END),
             sum(rows_in)
      FROM by_price)
    SELECT layout, predicate, CAST(n_shards AS BIGINT) AS n_shards,
           CAST(n_pruned AS BIGINT) AS n_pruned,
           round(CAST(rows_scanned AS DOUBLE) / rows_total + 1e-9, 4)
             AS scan_fraction
    FROM m ORDER BY layout, predicate
    """,
    priority=3,
)
def zone_map_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file-statistics) pruning effectiveness under two
    clustering layouts x two predicates.

    Models what the parquet reader's min-max row-group skipping would do
    if the table were laid out (a) by ingest month — the default
    append-order layout — or (b) clustered by the price column. A shard
    is prunable when its min-max range cannot intersect the predicate.
    The report quantifies the z-order tradeoff the zorder_cluster_key
    query implements: month-layout skips date predicates and scans
    everything for price predicates; price-layout inverts that. One
    aggregate per layout (shard key is a pure function of the row), so
    the whole report is two shuffles regardless of table size — this is
    exactly the metadata a lakehouse keeps per file, computed here from
    the raw table."""
    o = Tables(spark, sf_dir).orders

    def shard_stats(shard_col):
        return o.groupBy(shard_col.alias("shard")).agg(
            F.min("o_orderdate").alias("dmin"),
            F.max("o_orderdate").alias("dmax"),
            F.min("o_totalprice").alias("pmin"),
            F.max("o_totalprice").alias("pmax"),
            F.count(F.lit(1)).alias("rows_in"),
        )

    by_month = shard_stats(F.date_format("o_orderdate", "yyyy-MM"))
    # 32 equi-width price shards over [0, 600k): floor(p / 18750) — the
    # same explicit formula on both engines (DuckDB has no width_bucket).
    by_price = shard_stats(
        F.floor(F.col("o_totalprice") / 18750.0).cast("long")
    )

    d_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    d_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    date_pruned = (F.col("dmax") < d_lo) | (F.col("dmin") >= d_hi)
    price_pruned = F.col("pmax") <= 400000

    def report(stats: DataFrame, layout: str, pred_name: str, pruned) -> DataFrame:
        return stats.agg(
            F.lit(layout).alias("layout"),
            F.lit(pred_name).alias("predicate"),
            F.count(F.lit(1)).alias("n_shards"),
            F.sum(F.when(pruned, 1).otherwise(0)).alias("n_pruned"),
            F.round(
                F.sum(F.when(pruned, 0).otherwise(F.col("rows_in")))
                / F.sum("rows_in")
                + 1e-9,
                4,
            ).alias("scan_fraction"),
        ).select(
            "layout", "predicate", "n_shards", "n_pruned", "scan_fraction"
        )

    out = (
        report(by_month, "month", "date_1996", date_pruned)
        .unionByName(report(by_month, "month", "price_gt_400k", price_pruned))
        .unionByName(report(by_price, "price_bucket", "date_1996", date_pruned))
        .unionByName(report(by_price, "price_bucket", "price_gt_400k", price_pruned))
    )
    return out.orderBy("layout", "predicate")


_NEG_K = 3
# Portable 52-bit hash of the anchor id, DuckDB side.
_H52_DOC = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"


@query(
    "contrastive_negatives_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
      FROM documents),
    nn AS (SELECT count(*) AS n FROM ranked),
    anchors AS (
      SELECT doc_id, pos,
             {_H52_DOC} % ((SELECT n FROM nn) - {_NEG_K}) + 1 AS base
      FROM ranked),
    fan AS (
      SELECT a.doc_id, a.pos, j.j,
             (a.pos + a.base + j.j) % (SELECT n FROM nn) AS neg_pos
      FROM anchors a CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j)
    SELECT f.doc_id, f.j + 1 AS neg_rank, r.doc_id AS neg_doc_id
    FROM fan f JOIN ranked r ON r.pos = f.neg_pos
    ORDER BY f.doc_id, neg_rank
    """,
    priority=3,
)
def contrastive_negatives_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=3 deterministic pseudo-random negatives per anchor document
    (contrastive/embedding-model training), with no cross join.

    Hash-offset block sampling: documents are ranked on a hashed ring
    (row_number over the portable md5 hash — a deterministic random
    permutation); each anchor takes the k consecutive ring positions at
    offset base..base+k-1, where base = h(anchor) mod (N-k) + 1. The
    offset arithmetic guarantees the k negatives are distinct and never
    the anchor itself. Cost: one DISTRIBUTED global rank
    (operators/util.py:global_rank — range partition + local row_number
    + offset broadcast, never a single-task window), one k-way fan-out,
    one equi-join on ring position. The naive spec ("k smallest
    h(anchor||cand)") is an N^2 cross join; this plan is O(N·k).
    Near-dup exclusion composes downstream by anti-joining the
    dedup_near_clusters table on (anchor, negative)."""
    from ror_etl_spark.operators.util import global_rank

    docs = Tables(spark, sf_dir).documents
    ranked = global_rank(
        docs.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("__h")),
        "__h",
        "doc_id",
        out="pos",
    ).select("doc_id", "pos")
    # n as a LAZY broadcast single-row aggregate of the base table (rank
    # preserves row count) — the former eager ``ranked.count()`` executed
    # the whole global_rank range shuffle an extra time at construction
    h52 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    nd = docs.agg(F.count(F.lit(1)).alias("__n"))
    anchors = ranked.crossJoin(F.broadcast(nd)).select(
        "doc_id", "pos", "__n", (h52 % (F.col("__n") - _NEG_K) + 1).alias("base")
    )
    fan = anchors.select(
        "doc_id",
        "pos",
        "base",
        "__n",
        F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("j"),
    ).select(
        "doc_id",
        "j",
        ((F.col("pos") + F.col("base") + F.col("j")) % F.col("__n")).alias("neg_pos"),
    )
    neg = ranked.select(F.col("pos").alias("neg_pos"), F.col("doc_id").alias("neg_doc_id"))
    out = fan.join(neg, "neg_pos").select(
        "doc_id", (F.col("j") + 1).alias("neg_rank"), "neg_doc_id"
    )
    return ordered(out, "doc_id", "neg_rank")
