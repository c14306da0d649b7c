"""Corpus-level training-data operators: language sampling weights,
BM25 retrieval, and DSIR-style importance weighting.

These extend the LLM-data-pipeline surface (SURVEY.md §2.3 "corpus
quality filters" / "text analysis" families) with the mixture- and
selection-side operators a pretraining pipeline needs AFTER filtering:
deciding how much of each language/domain to sample (UniMax-style
temperature weights), retrieving documents against a query (BM25 —
the standard sparse-retrieval scorer), and scoring documents by how
target-like they are (DSIR's importance ratio between two
self-trained unigram LMs).

All three follow the repo's oracle discipline: exact integer counts
cross the engine boundary, float math happens in identical expression
shapes on both sides, and every emitted float is rounded with the
epsilon shift (``round(x + 1e-9, d)``) so summation-order ulps can't
flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.functions.text import token_count, tokens
from ror_etl_spark.queries.util import ordered
from ror_etl_spark.operators.util import spread
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

# DuckDB twin of functions.text.tokens(): lowercase, collapse whitespace
# runs, trim, split on single spaces — same normalization every text
# oracle in the repo uses.
_TOKS_SQL = (
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
)


@query(
    "corpus_language_sampling_weights",
    oracle=f"""
    WITH per AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
    j AS (
      SELECT lang, n_docs, n_tokens,
             n_tokens / tot.t AS share_raw,
             sqrt(n_tokens / tot.t) AS w_raw
      FROM per CROSS JOIN tot),
    den AS (SELECT sum(w_raw) AS s FROM j)
    SELECT lang, n_docs, n_tokens,
           round(share_raw + 1e-9, 6) AS token_share,
           round(w_raw / den.s + 1e-9, 6) AS weight,
           round((w_raw / den.s) / share_raw + 1e-9, 4) AS boost
    FROM j CROSS JOIN den
    ORDER BY lang
    """,
    priority=3,
)
def corpus_language_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax/temperature language-sampling weights (τ = 2, i.e. weight
    ∝ share^(1/2)): per-language token counts → natural share → the
    temperature-flattened sampling weight and the implied upsampling
    ``boost`` (weight/share — how many extra epochs a low-resource
    language effectively gets). The standard multilingual-pretraining
    mixture knob (mT5 §3.1 / UniMax shape).

    Scale shape: ONE map-side-combined aggregate keyed on lang (the
    token counting is a per-row expression, no explode), then two
    scalar totals broadcast back over a languages-sized frame. Nothing
    document-sized ever shuffles; at 100 TB the only reduce is
    |languages| rows. sqrt is exact IEEE on both engines; the two
    divisions happen on raw doubles in identical expression shape and
    every output is epsilon-rounded, so the hash replays."""
    d = Tables(spark, sf_dir).documents
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    j = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("t")).alias("share_raw"),
        F.sqrt(F.col("n_tokens") / F.col("t")).alias("w_raw"),
    )
    den = j.agg(F.sum("w_raw").alias("s"))
    return (
        j.crossJoin(F.broadcast(den))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("share_raw") + 1e-9, 6).alias("token_share"),
            F.round(F.col("w_raw") / F.col("s") + 1e-9, 6).alias("weight"),
            F.round((F.col("w_raw") / F.col("s")) / F.col("share_raw") + 1e-9, 4).alias(
                "boost"
            ),
        )
        .orderBy("lang")
    )


_BM25_TERMS = ("join", "filter", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents),
    dl AS (SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS dl FROM documents),
    stats AS (
      SELECT count(*) AS n, round(avg(dl) + 1e-9, 6) AS avgdl FROM dl),
    qt AS (SELECT doc_id, w FROM toks WHERE w IN ({terms})),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM qt GROUP BY doc_id, w),
    df AS (SELECT w, count(DISTINCT doc_id) AS df FROM qt GROUP BY w)
    SELECT tf.doc_id,
           round(sum(
             ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({k1} + 1)
             / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
           ) + 1e-9, 4) AS bm25,
           count(*) AS matched_terms
    FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT {_BM25_TOPK}
    """


@query("text_bm25_topk", oracle=_bm25_oracle(), priority=3)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval: top-20 documents for the fixed query
    {join, filter, hash} under Okapi BM25 (k1=1.2, b=0.75, the
    ln(1 + (N-df+0.5)/(df+0.5)) idf variant — Lucene's non-negative
    form).

    Scale shape: the token explode is filtered to QUERY TERMS before
    anything aggregates, so the shuffled volume is (matching doc,
    term) pairs — query-output-sized, not corpus-sized. Document
    lengths come from a per-row expression (no explode), corpus stats
    (N, avgdl) are one broadcast scalar row, the df table is
    |query-terms| rows and broadcast into the scoring join. The plan
    ends in TakeOrderedAndProject(20) — no global sort materializes.
    avgdl is rounded to 6 dp on BOTH engines before entering the
    score (the kmeans round_means trick: quantize trajectory inputs so
    downstream float math sees bit-identical operands), and the final
    score is epsilon-rounded at 4 dp to absorb ln() last-ulp and
    summation-order differences."""
    d = spread(Tables(spark, sf_dir).documents)
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    dl = d.select("doc_id", token_count(F.col("text")).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dl") + 1e-9, 6).alias("avgdl"),
    )
    qt = toks.filter(F.col("w").isin(*_BM25_TERMS))
    tf = qt.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qt.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    k1, b = _BM25_K1, _BM25_B
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df_), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(idf * norm) + 1e-9, 4).alias("bm25"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


@query(
    "llm_dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_TOKS_SQL}) AS w FROM documents),
    freq AS (
      SELECT w,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs
      FROM toks GROUP BY w),
    tots AS (
      SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cs) AS BIGINT) AS ts,
             count(*) AS v
      FROM freq)
    SELECT toks.doc_id,
           count(*) AS n_tokens,
           round(sum(
             ln((freq.ct + 1) / (tots.tt + tots.v))
             - ln((freq.cs + 1) / (tots.ts + tots.v))
           ) + 1e-9, 4) AS log_ratio,
           round(sum(
             ln((freq.ct + 1) / (tots.tt + tots.v))
             - ln((freq.cs + 1) / (tots.ts + tots.v))
           ) + 1e-9, 4) >= 0 AS target_like
    FROM toks JOIN freq USING (w) CROSS JOIN tots
    GROUP BY toks.doc_id
    ORDER BY toks.doc_id
    """,
    priority=3,
)
def llm_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023's shape on unigram
    features): score every document by the log importance ratio
    ``Σ_w ln p_target(w) − ln p_source(w)`` between two self-trained
    add-1-smoothed unigram LMs — target = the English slice, source =
    everything else. Documents with ``log_ratio ≥ 0`` look more like
    the target distribution and would be preferentially resampled.

    Scale shape: identical to the surprisal filters — one token
    explode (lazily checkpointed: both the LM aggregate and the
    scoring join consume it), ONE map-side-combined count aggregate
    training BOTH LMs in a single pass (conditional sums per token),
    a token-keyed join back (AQE broadcasts closed vocabularies,
    degrades to a shuffle join under Heaps-law growth), and a
    per-document sum. Only (doc_id, token) pairs move. Counts are
    exact integers on both engines; the keep flag derives from the
    ROUNDED score so the boolean replays bit-identically."""
    d = spread(Tables(spark, sf_dir).documents)
    toks = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("w")
    ).localCheckpoint(eager=False)
    en = F.when(F.col("lang") == "en", 1).otherwise(0)
    freq = toks.groupBy("w").agg(
        F.sum(en).alias("ct"), F.sum(1 - en).alias("cs")
    )
    tots = freq.agg(
        F.sum("ct").alias("tt"), F.sum("cs").alias("ts"), F.count(F.lit(1)).alias("v")
    )
    term = F.log((F.col("ct") + 1) / (F.col("tt") + F.col("v"))) - F.log(
        (F.col("cs") + 1) / (F.col("ts") + F.col("v"))
    )
    per = (
        toks.join(freq, "w")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(term) + 1e-9, 4).alias("log_ratio"),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "log_ratio",
        (F.col("log_ratio") >= 0).alias("target_like"),
    ).orderBy("doc_id")


_BPE_MERGES = 10

# Explicit driver-side bound on the trained vocabulary (VERDICT r7 item 2):
# the merge loop's word-frequency table is collected to the driver, which is
# Heaps-law sublinear but previously an ASSUMED bound. Now it is enforced —
# deterministic top-N by (count desc, word asc), a TakeOrderedAndProject on
# the Spark side, ORDER BY ... LIMIT in the oracle's wc CTE. 1M entries
# ≈ tens of MB on the driver; at the test SFs the vocabulary is far below
# the cap, so results are unchanged (pinned by test_bpe_vocab_cap). Words
# outside the cap fall back to character segmentation in
# llm_bpe_token_counts (LEFT JOIN + coalesce on both sides) — the rarest
# words, which by construction contribute no learned merges.
_BPE_VOCAB_CAP = 1_000_000


def _bpe_ctes(k: int = _BPE_MERGES, vocab_cap: int = _BPE_VOCAB_CAP) -> list[str]:
    """Unrolled replay of the BPE merge loop: s0 = per-word character
    segmentations (chr(1)-joined) with corpus counts; each step counts
    adjacent symbol pairs per position (weighted by word count), picks
    the winner (count desc, then lexicographic left, right), and applies
    it via separator replace — which is exactly leftmost non-overlapping
    merging, the same semantics as Python's str.replace in the Spark
    driver loop. Two independent implementations of the whole trainer
    must land on identical merge tables. Returns the CTE chain through
    ``s{k}`` (final segmentations) with ``m1..mk`` (the merges)."""
    ctes = [
        f"""wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
      WHERE w <> '' GROUP BY w
      ORDER BY c DESC, w LIMIT {vocab_cap})""",
        """s0 AS (
      SELECT w, c,
             array_to_string(
               list_transform(range(1, length(w) + 1),
                              i -> substr(w, CAST(i AS INT), 1)), chr(1)) AS seg
      FROM wc)""",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""p{i} AS (
      SELECT syms[j] AS l, syms[j + 1] AS r, CAST(sum(c) AS BIGINT) AS cnt
      FROM (SELECT c, string_split(seg, chr(1)) AS syms,
                   unnest(range(1, greatest(len(string_split(seg, chr(1))), 1))) AS j
            FROM s{i - 1})
      GROUP BY l, r)"""
        )
        ctes.append(
            f"""m{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        ctes.append(
            f"""s{i} AS (
      SELECT s.w, s.c, replace(s.seg, m.l || chr(1) || m.r, m.l || m.r) AS seg
      FROM s{i - 1} s, m{i} m)"""
        )
    return ctes


def _bpe_oracle(k: int = _BPE_MERGES) -> str:
    unions = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS left, r AS right,"
        f" l || r AS merged, cnt AS pair_count FROM m{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(_bpe_ctes(k)) + f" {unions} ORDER BY rank"


@query("llm_bpe_merges", oracle=_bpe_oracle(), priority=3)
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al.) — the op every
    pretraining pipeline runs before token counting: learn the first 10
    merge rules from corpus word frequencies. Deterministic end to end:
    winner = (pair count desc, then lexicographic), merging is leftmost
    non-overlapping.

    Scale shape — the honest one, matching how production BPE trainers
    work: the CORPUS-sized work is one map-side-combined word-count
    aggregate (the only pass over the data); the merge loop runs over
    the word-frequency table, which is vocabulary-sized (Heaps-law
    sublinear — millions of entries at 100 TB, driver-feasible, and the
    loop is what HuggingFace/sentencepiece do in one process after an
    identical distributed count). The oracle replays the ENTIRE trainer
    — per-position pair counting, tie-breaks, leftmost merging — as ten
    unrolled SQL steps, so the Spark driver loop and DuckDB must agree
    symbol for symbol; the output is all integers and strings, no float
    anywhere."""
    _, merges, _ = _train_bpe(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, pair_count long"
    ).orderBy("rank")


def _bpe_wordcounts(
    spark: SparkSession, sf_dir: str, vocab_cap: int = _BPE_VOCAB_CAP
) -> DataFrame:
    """The trainer's one corpus-sized pass: word counts with the capped
    deterministic top-N floor. Shared with the plan-invariant test so
    the TakeOrderedAndProject pin guards THIS frame, not a copy."""
    d = spread(Tables(spark, sf_dir).documents)
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(vocab_cap)
    )


def _train_bpe(
    spark: SparkSession, sf_dir: str, vocab_cap: int = _BPE_VOCAB_CAP
) -> tuple[list[tuple[str, int]], list[tuple[int, str, str, str, int]], dict[str, str]]:
    """One corpus-sized word-count aggregate, then the vocab-sized merge
    loop (see llm_bpe_merges). Returns (vocab, merges, final segs).

    The driver transfer is bounded: deterministic top-``vocab_cap`` by
    (count desc, word asc) — orderBy().limit() compiles to
    TakeOrderedAndProject, so each executor ships at most ``vocab_cap``
    rows and the driver holds exactly one capped heap-merge."""
    wc = _bpe_wordcounts(spark, sf_dir, vocab_cap)
    vocab = [(r["w"], int(r["c"])) for r in wc.collect()]
    SEP = "\x01"
    segs = {w: SEP.join(w) for w, _ in vocab}
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, _BPE_MERGES + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in vocab:
            syms = segs[w].split(SEP)
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, cnt))
        for w, _ in vocab:
            segs[w] = segs[w].replace(l + SEP + r, l + r)
    return vocab, merges, segs


@query(
    "llm_bpe_token_counts",
    oracle="WITH "
    + ",\n    ".join(_bpe_ctes())
    + f"""
    , dtoks AS (
      SELECT doc_id, w FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents)
      WHERE w <> '')
    SELECT dtoks.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(coalesce(len(string_split(s{_BPE_MERGES}.seg, chr(1))),
                             length(dtoks.w))) AS BIGINT)
             AS n_bpe_tokens
    FROM dtoks LEFT JOIN s{_BPE_MERGES} ON s{_BPE_MERGES}.w = dtoks.w
    GROUP BY dtoks.doc_id
    ORDER BY dtoks.doc_id
    """,
    priority=3,
)
def llm_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE: per-document token counts under the
    10-merge vocabulary from llm_bpe_merges — the number a sequence
    packer or cost model actually consumes (vs the regex-heuristic
    bpe_ish_token_count, this is a REAL learned segmentation).

    Output contract for words OUTSIDE the vocab cap (the r8 1M-row
    TakeOrderedAndProject floor, binding only at large SF): capped words
    count length(w) characters, i.e. learned merges are NOT applied to
    their character sequences. Real BPE inference would still merge
    inside OOV words, so capped-word token counts are a deliberate
    OVERestimate (safe direction for a packing/cost consumer — never
    under-budgets a sequence). Both engines apply the identical rule, so
    the hash check holds at cap-binding scale too.

    Scale shape: the trained segmentation is a vocabulary-sized (word →
    n_subtokens) table; applying it is one token-keyed join of the
    corpus token stream against that broadcast table plus a
    per-document sum — the surprisal-filter join economics, with the
    trainer's one aggregate pass amortized across both BPE queries. The
    oracle re-derives the segmentation with the same unrolled merge
    steps and must agree on every document's count."""
    _, _, segs = _train_bpe(spark, sf_dir)
    seg_len = [(w, len(s.split("\x01"))) for w, s in segs.items()]
    lens = F.broadcast(
        spark.createDataFrame(seg_len, "w string, n_sub long")
    )
    d = spread(Tables(spark, sf_dir).documents)
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    return (
        toks.join(lens, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            # OOV under the vocab cap (rarest words only): no learned merge
            # could have come from them, so they segment to characters.
            F.sum(F.coalesce(F.col("n_sub"), F.length("w"))).alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_naive_bayes_lang",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_TOKS_SQL}) AS w FROM documents),
    dtf AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS k
      FROM toks GROUP BY doc_id, lang, w),
    clst AS (
      SELECT lang AS cls, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY 1),
    nd AS (
      SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM toks),
    cw AS (
      SELECT w, lang AS cls, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY w, lang),
    sc AS (
      SELECT d.doc_id, d.lang,
             ct.cls,
             ln(nd.n_docs / tot.n)
               + sum(d.k * ln((coalesce(cw.c, 0) + 1) / (ct.ct + voc.v))) AS raw
      FROM dtf d
      CROSS JOIN clst ct
      LEFT JOIN cw ON cw.w = d.w AND cw.cls = ct.cls
      JOIN nd ON nd.cls = ct.cls
      CROSS JOIN tot CROSS JOIN voc
      GROUP BY d.doc_id, d.lang, ct.cls, nd.n_docs, tot.n, ct.ct, voc.v),
    r AS (
      SELECT doc_id, lang, cls,
             round(raw + 1e-9, 4) AS score,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(raw + 1e-9, 4) DESC, cls) AS rn
      FROM sc)
    SELECT doc_id, lang, cls AS pred_lang, score,
           (cls = lang) AS is_actual
    FROM r WHERE rn = 1 ORDER BY doc_id
    """,
    priority=3,
)
def text_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identification, self-trained on
    the corpus's own ``lang`` labels: per-class token counts with add-1
    smoothing, per-document log-posterior ``ln P(cls) + Σ_w k_w ·
    ln((c_cls,w + 1)/(T_cls + V))``, argmax over classes. The standard
    counts-based quality/language classifier shape (fastText's niche
    before embeddings) — every model parameter is an exact integer
    count, so BOTH engines train the identical model and the driver
    hash-checks training AND inference end to end.

    On the driver corpus all five languages share one 31-word
    vocabulary, so the posterior is dominated by the class priors and
    per-class token totals (no lexical signal exists to find); the
    operator's mechanics — smoothed likelihood table, prior, argmax
    with a deterministic tiebreak — are exactly what runs on a real
    corpus, where c_cls,w differs by class.

    Scale shape (r12 optimization round): per-document token counts
    (``dtf``) come map-side from the sorted token array
    (``sorted_runs`` — the text_term_frequency precedent): each
    document's rows are born in its scan partition, so no exchange
    carries the token stream for scoring, and the one remaining
    stream aggregate (the (w, cls) model table ``cw``) partial-
    aggregates map-side to vocab×classes-sized partials. Class token
    totals are the map-side sum of array sizes (no explode); the
    vocabulary size and the scoring join both read the lazily
    checkpointed ``cw`` (bounded by the model size) instead of
    re-scanning the stream. The argmax is a per-document window over
    |classes| rows and compares ROUNDED scores with a class-name
    tiebreak, so summation-order ulps can't flip the winner."""
    from ror_etl_spark.functions.text import sorted_runs

    d = spread(Tables(spark, sf_dir).documents)
    dt = d.select("doc_id", "lang", tokens(F.col("text")).alias("ws"))
    st = dt.select("doc_id", "lang", F.array_sort("ws").alias("st"))
    rc = st.select("doc_id", "lang", "st", sorted_runs(F.col("st")).alias("rs"))
    dtf = rc.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                "rs",
                lambda r: F.struct(
                    F.get(F.col("st"), r["s"]).alias("w"), r["c"].alias("k")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "lang", "p.w", F.col("p.k").cast("long").alias("k"))
    clst = dt.groupBy(F.col("lang").alias("cls")).agg(
        F.sum(F.size("ws")).alias("ct")
    )
    nd = d.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    cw = (
        dt.select(F.col("lang").alias("cls"), F.explode("ws").alias("w"))
        .groupBy("w", "cls")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # two consumers: voc + the join
    )
    voc = cw.agg(F.countDistinct("w").alias("v"))
    cls_full = (
        clst.join(nd, "cls")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
    )
    contrib = F.col("k") * F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1) / (F.col("ct") + F.col("v"))
    )
    sc = (
        dtf.crossJoin(F.broadcast(cls_full))
        .join(cw, ["w", "cls"], "left")
        .groupBy(
            "doc_id", "lang", "cls", "n_docs", "n", "ct", "v"
        )
        .agg(F.sum(contrib).alias("s"))
        .select(
            "doc_id",
            "lang",
            "cls",
            (F.log(F.col("n_docs") / F.col("n")) + F.col("s")).alias("raw"),
        )
    )
    from pyspark.sql import Window

    score = F.round(F.col("raw") + 1e-9, 4)
    w_doc = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("cls").asc())
    return (
        sc.select(
            "doc_id",
            "lang",
            "cls",
            score.alias("score"),
            F.row_number().over(w_doc).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cls").alias("pred_lang"),
            "score",
            (F.col("cls") == F.col("lang")).alias("is_actual"),
        )
        # no trailing ORDER BY: the gate hashes order-insensitively (the
        # r12 trailing-sort precedent)
    )


_ZIPF_TOP = 100


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
    top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
      FROM freq ORDER BY c DESC, w LIMIT {_ZIPF_TOP}),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(ln(r)) AS sx, sum(ln(c)) AS sy,
             sum(ln(r) * ln(c)) AS sxy,
             sum(ln(r) * ln(r)) AS sxx,
             sum(ln(c) * ln(c)) AS syy
      FROM top)
    SELECT n AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-9, 4) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 + 1e-9, 4) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) + 1e-9, 4) AS r2
    FROM s
    """,
    priority=3,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: closed-form OLS
    of ln(frequency) on ln(rank) over the top-100 terms — slope (a
    natural corpus should sit near −1), intercept, and R². The standard
    corpus-health diagnostic a pretraining pipeline runs per shard: a
    slope far from −1 or a low R² flags synthetic/boilerplate-heavy
    data (this driver corpus's 31-word uniform-ish vocabulary is
    exactly such a flag, which the numbers show).

    Scale shape: one map-side-combined token-frequency aggregate, a
    TakeOrderedAndProject top-k (never a global sort of the Heaps-law
    vocabulary), a rank window over the k ≤ 100 surviving rows, and
    one scalar regression aggregate — the closed-form normal equations,
    no iteration. Both engines compute ln on identical exact integer
    inputs and every output is epsilon-rounded, so the fit replays
    bit-identically."""
    d = Tables(spark, sf_dir).documents
    toks = d.select(F.explode(tokens(F.col("text"))).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = freq.orderBy(F.col("c").desc(), F.col("w")).limit(_ZIPF_TOP)
    from pyspark.sql import Window

    w_all = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = top.select("c", F.row_number().over(w_all).alias("r"))
    lx, ly = F.log(F.col("r")), F.log(F.col("c"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(ly * ly).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_terms"),
        F.round(slope + 1e-9, 4).alias("slope"),
        F.round((sy - slope * sx) / n + 1e-9, 4).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            + 1e-9,
            4,
        ).alias("r2"),
    )


# per-decile keep rate (d+1)/10 as a 4-hex md5-prefix cutoff; top decile
# keeps everything ('zzzz' compares above every hex string)
_CURR_CUTS = [format(65536 * (d + 1) // 10, "04x") for d in range(9)] + ["zzzz"]


@query(
    "corpus_quality_curriculum_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents),
    bounds AS (
      SELECT [round(quantile_cont(n_tokens, 0.1), 6), round(quantile_cont(n_tokens, 0.2), 6),
              round(quantile_cont(n_tokens, 0.3), 6), round(quantile_cont(n_tokens, 0.4), 6),
              round(quantile_cont(n_tokens, 0.5), 6), round(quantile_cont(n_tokens, 0.6), 6),
              round(quantile_cont(n_tokens, 0.7), 6), round(quantile_cont(n_tokens, 0.8), 6),
              round(quantile_cont(n_tokens, 0.9), 6)] AS bs
      FROM toks),
    assigned AS (
      SELECT doc_id, n_tokens,
             CAST(len(list_filter(bounds.bs, b -> n_tokens > b)) AS BIGINT)
               AS decile
      FROM toks CROSS JOIN bounds)
    SELECT doc_id, n_tokens, decile
    FROM assigned
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          (['{"','".join(_CURR_CUTS)}'])[decile + 1]
    ORDER BY doc_id
    """,
    priority=3,
)
def corpus_quality_curriculum_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum sampling (the DataComp/DoReMi-adjacent knob a
    pretraining mixer applies after filtering): documents are binned
    into exact quality deciles — quality proxied here by token count —
    and sampled with decile-dependent keep rates 10%, 20%, …, 100%, so
    higher-quality strata are oversampled while every stratum stays
    represented. Membership is content-hash Bernoulli (md5 of the doc
    id against a per-decile hex cutoff), so the SAME documents survive
    on any engine, any partitioning, any run — the property rand()
    sampling does not have, and the reason the driver can hash-check a
    SAMPLER.

    Scale shape: decile boundaries come from ONE percentile aggregate
    broadcast as a 9-element array (never an ntile window dragging the
    corpus through a single-partition sort); bin assignment is an array
    fold and the sampling gate a pure codegen predicate that pushes
    down like any filter. Nothing shuffles except the presentation
    sort. The percentile values are rounded at 6 dp on both engines
    before the integer-vs-bound comparisons, the established
    equidepth_bin_assign discipline."""
    d = Tables(spark, sf_dir).documents
    toks = d.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    qs = ", ".join(str(i / 10) for i in range(1, 10))
    bounds = toks.agg(
        F.expr(
            f"transform(percentile(n_tokens, array({qs})), x -> round(x, 6))"
        ).alias("bs")
    )
    cuts = F.array(*[F.lit(c) for c in _CURR_CUTS])
    assigned = toks.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "n_tokens",
        F.aggregate(
            F.col("bs"),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("n_tokens") > b, 1).otherwise(0),
        ).cast("long").alias("decile"),
    )
    kept = assigned.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
        < F.element_at(cuts, (F.col("decile") + 1).cast("int"))
    )
    return kept.select("doc_id", "n_tokens", "decile").transform(ordered, "doc_id")


@query(
    "corpus_drift_psi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % 2 = 0 AS in_a, unnest({_TOKS_SQL}) AS w FROM documents),
    freq AS (
      SELECT w,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
      FROM toks GROUP BY w),
    tots AS (
      SELECT CAST(sum(c_a) AS BIGINT) AS ta, CAST(sum(c_b) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS v
      FROM freq),
    terms AS (
      SELECT w, c_a, c_b,
             ((c_a + 1) / (ta + v) - (c_b + 1) / (tb + v))
               * ln(((c_a + 1) / (ta + v)) / ((c_b + 1) / (tb + v))) AS term
      FROM freq CROSS JOIN tots),
    tot AS (SELECT sum(term) AS total FROM terms)
    SELECT w, c_a, c_b,
           round(term + 1e-9, 6) AS psi_term,
           round(tot.total + 1e-9, 4) AS total_psi
    FROM terms CROSS JOIN tot
    ORDER BY psi_term DESC, w LIMIT 20
    """,
    priority=3,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two corpus snapshots via the
    Population Stability Index — PSI = Σ_w (p_w − q_w)·ln(p_w/q_w) over
    add-1-smoothed token distributions (snapshots simulated as the
    even/odd doc_id halves — deterministic, engine-free). The standard
    train/serve drift gate: PSI < 0.1 is stable, > 0.25 means the new
    crawl's language has shifted enough to re-examine filters. Output:
    the 20 highest-contributing tokens (the "what changed" half of the
    report) with the corpus-level total on every row.

    Scale shape: ONE token-explode count aggregate trains both
    distributions in a single pass (conditional sums — the DSIR
    economics); everything after operates on the vocabulary-sized
    frequency table: a scalar totals broadcast, a per-token expression,
    one scalar PSI sum, and a TakeOrderedAndProject on the ROUNDED
    contribution (both engines rank the same rounded value, w as
    tiebreak). Nothing document-sized moves twice."""
    d = spread(Tables(spark, sf_dir).documents)
    toks = d.select(
        (F.col("doc_id") % 2 == 0).alias("in_a"),
        F.explode(tokens(F.col("text"))).alias("w"),
    )
    in_a = F.when(F.col("in_a"), 1).otherwise(0)
    freq = toks.groupBy("w").agg(
        F.sum(in_a).alias("c_a"), F.sum(1 - in_a).alias("c_b")
    )
    tots = freq.agg(
        F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("c_a") + 1) / (F.col("ta") + F.col("v"))
    q = (F.col("c_b") + 1) / (F.col("tb") + F.col("v"))
    terms = freq.crossJoin(F.broadcast(tots)).select(
        "w", "c_a", "c_b", ((p - q) * F.log(p / q)).alias("term")
    )
    terms = terms.localCheckpoint(eager=False)
    tot = terms.agg(F.sum("term").alias("total"))
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            "w",
            "c_a",
            "c_b",
            F.round(F.col("term") + 1e-9, 6).alias("psi_term"),
            F.round(F.col("total") + 1e-9, 4).alias("total_psi"),
        )
        .orderBy(F.desc("psi_term"), F.asc("w"))
        .limit(20)
    )


@query(
    "corpus_mixture_resample",
    oracle=f"""
    WITH per AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
    j AS (
      SELECT lang, n_tokens / tot.t AS share_raw,
             sqrt(n_tokens / tot.t) AS w_raw
      FROM per CROSS JOIN tot),
    den AS (SELECT sum(w_raw) AS s FROM j),
    boost AS (
      SELECT lang,
             CAST(round(round((w_raw / den.s) / share_raw + 1e-9, 4) * 10000)
               AS BIGINT) AS b4
      FROM j CROSS JOIN den),
    docs AS (
      SELECT d.doc_id, d.lang, b.b4,
             b.b4 // 10000
               + CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                             ::BIGINT % 10000 < b.b4 % 10000
                      THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN boost b USING (lang))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_copies) AS BIGINT) AS total_copies,
           round(CAST(sum(n_copies) AS DOUBLE) / count(*) + 1e-9, 4)
             AS realized_boost,
           round(max(b4) / 10000.0, 4) AS target_boost
    FROM docs GROUP BY lang ORDER BY lang
    """,
    priority=3,
)
def corpus_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZE the UniMax mixture: every document gets an integer
    copy count realizing its language's upsampling boost — ``⌊boost⌋``
    copies plus one more iff a content-hash gate falls under the
    fractional part. Deterministic (same docs get the extra epoch on
    every engine/run), and the per-language REALIZED boost converges to
    the target as the stratum grows — the report shows both. This is
    the step that turns the sampling-weights REPORT into training
    input: downstream, ``explode(sequence(1, n_copies))`` emits the
    actual epochs, a metadata-only expansion.

    Scale shape: the boost table is |languages| rows (one aggregate +
    scalar broadcasts, exactly the language-weights plan); per-doc copy
    counts are a broadcast join + codegen integer arithmetic (the
    4-dp boost is scaled to an exact integer b4, so the fractional
    gate is ``md5 % 10000 < b4 % 10000`` — no float decides
    anything); the report is one lang-keyed aggregate. Nothing
    document-sized shuffles twice."""
    d = Tables(spark, sf_dir).documents
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    j = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        (F.col("n_tokens") / F.col("t")).alias("share_raw"),
        F.sqrt(F.col("n_tokens") / F.col("t")).alias("w_raw"),
    )
    den = j.agg(F.sum("w_raw").alias("s"))
    boost = j.crossJoin(F.broadcast(den)).select(
        "lang",
        F.round(
            F.round((F.col("w_raw") / F.col("s")) / F.col("share_raw") + 1e-9, 4)
            * 10000
        )
        .cast("long")
        .alias("b4"),
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 10000
    )
    docs = d.select("doc_id", "lang").join(F.broadcast(boost), "lang").select(
        "lang",
        "b4",
        (
            F.floor(F.col("b4") / 10000)
            + F.when(gate < F.col("b4") % 10000, 1).otherwise(0)
        ).alias("n_copies"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_copies").alias("total_copies"),
            F.round(
                F.sum("n_copies") / F.count(F.lit(1)) + 1e-9, 4
            ).alias("realized_boost"),
            F.round(F.max("b4") / 10000.0, 4).alias("target_boost"),
        )
        .orderBy("lang")
    )


@query(
    "cooccurrence_pmi_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
    pos AS (
      SELECT doc_id, unnest(ts) AS tok,
             unnest(range(1, len(ts) + 1)) AS i
      FROM toks),
    posf AS (SELECT * FROM pos WHERE tok <> ''),
    pairs AS (
      SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM posf a JOIN posf b
        ON a.doc_id = b.doc_id AND b.i - a.i IN (1, 2)
      GROUP BY w1, w2),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM posf GROUP BY tok),
    tot AS (
      SELECT (SELECT sum(c) FROM uni) AS t,
             (SELECT sum(n_pair) FROM pairs) AS p)
    SELECT w1, w2, n_pair,
           round(ln((CAST(n_pair AS DOUBLE) * t.t * t.t)
                    / (CAST(t.p AS DOUBLE) * u1.c * u2.c)) + 1e-9, 4) AS pmi
    FROM pairs
    JOIN uni u1 ON pairs.w1 = u1.tok
    JOIN uni u2 ON pairs.w2 = u2.tok
    CROSS JOIN tot t
    WHERE n_pair >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    priority=3,
)
def cooccurrence_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence with pointwise mutual information — the
    word2vec/GloVe-style statistic a pretraining pipeline computes to
    build association vocabularies: ordered token pairs within a +-2
    window, PMI = ln(p(w1,w2) / (p(w1) p(w2))).

    Pair generation is MAP-SIDE ONLY: for each lag k in {{1, 2}} the
    token array is zipped with its k-shifted self (element_at over a
    sequence — no positional self-join, which would shuffle every token
    occurrence twice). The only shuffles are the (w1, w2) count and two
    vocab-sized broadcast joins for the unigram counts. Exact integer
    counts cross the engine boundary; the single ln() is computed from
    one identically-shaped rational on both sides and rounded with the
    epsilon shift. The oracle generates pairs the orthogonal way (a
    positional self-join) — structural double-entry for the windowing.

    At 100 TB: pair-count state is vocab^2-bounded (and n_pair >= 5
    prunes the long tail before the join); nothing document-sized ever
    shuffles."""
    docs = Tables(spark, sf_dir).documents
    ts = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    pair_expr = (
        "flatten(transform(array(1, 2), k -> "
        "transform(sequence(1, greatest(size(ts) - k, 0)), "
        "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + k) AS w2))))"
    )
    pairs_raw = (
        docs.select(ts.alias("ts"))
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    pairs = pairs_raw.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = (
        docs.select(F.explode(ts).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("t")).crossJoin(
        pairs.agg(F.sum("n_pair").alias("p"))
    )
    out = (
        pairs.where(F.col("n_pair") >= 5)
        .join(F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") * F.col("t") * F.col("t"))
                    / (F.col("p").cast("double") * F.col("c1") * F.col("c2"))
                )
                + 1e-9,
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )
    return out


@query(
    "vocab_nucleus_topp",
    oracle=f"""
    WITH occ AS (
      SELECT lang, unnest({_TOKS_SQL}) AS tok FROM documents),
    freq AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM occ WHERE tok <> '' GROUP BY lang, tok),
    tot AS (SELECT lang, sum(c) AS t FROM freq GROUP BY lang),
    cum AS (
      SELECT f.lang, f.tok, f.c, tot.t,
             sum(f.c) OVER (
               PARTITION BY f.lang ORDER BY f.c DESC, f.tok
               ROWS UNBOUNDED PRECEDING) AS run
      FROM freq f JOIN tot ON f.lang = tot.lang),
    kept AS (
      SELECT lang, c, t, run,
             CASE WHEN run - c < 0.9 * t THEN 1 ELSE 0 END AS keep
      FROM cum)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS vocab_total,
           CAST(sum(keep) AS BIGINT) AS vocab_kept,
           round(CAST(sum(CASE WHEN keep = 1 THEN c ELSE 0 END) AS DOUBLE)
                 / any_value(t) + 1e-9, 6) AS mass_kept
    FROM kept GROUP BY lang ORDER BY lang
    """,
    priority=3,
)
def vocab_nucleus_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) vocabulary truncation per language: the smallest
    prefix of the frequency-sorted vocabulary whose cumulative mass
    reaches p = 0.9 — how tokenizer vocabularies and sampling nuclei are
    cut.

    A token is kept iff the cumulative mass BEFORE it is < 0.9·total
    (the standard "include the crossing element" rule, stated
    identically on both engines with exact integer counts — the 0.9·t
    comparison point is one float product of the same two numbers, so no
    summation-order ulps exist). Plan: one (lang, tok) count, a
    lang-partitioned running sum (window over the vocab-sized frame —
    NOT the corpus), one summary aggregate. Vocabulary is Heaps-law
    sublinear, so the windowed stage stays small however big the corpus
    gets."""
    docs = Tables(spark, sf_dir).documents
    from pyspark.sql import Window as W

    occ = docs.select(
        "lang",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    freq = occ.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("lang").agg(F.sum("c").alias("t"))
    cum = freq.join(F.broadcast(tot), "lang").withColumn(
        "run",
        F.sum("c").over(
            W.partitionBy("lang")
            .orderBy(F.desc("c"), F.asc("tok"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    kept = cum.withColumn(
        "keep", F.when(F.col("run") - F.col("c") < 0.9 * F.col("t"), 1).otherwise(0)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("vocab_total"),
            F.sum("keep").alias("vocab_kept"),
            F.round(
                F.sum(F.when(F.col("keep") == 1, F.col("c")).otherwise(0)).cast(
                    "double"
                )
                / F.any_value(F.col("t"))
                + 1e-9,
                6,
            ).alias("mass_kept"),
        )
        .orderBy("lang")
    )
