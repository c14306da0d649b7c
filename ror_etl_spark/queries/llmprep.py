"""LLM training-data preparation queries: boilerplate detection,
repetition filtering, token-entropy scoring, C4-style quality rules, and
PII redaction.

These are the corpus-cleaning passes a 100 TB pretraining pipeline runs
between raw crawl and tokenization (the C4 paper's heuristics, Gopher's
repetition rules, every pipeline's PII scrub). Each is expressed as pure
DataFrame ops (no UDFs — everything stays in whole-stage codegen) and is
hash-checked against a DuckDB oracle replaying identical rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ror_etl_spark.operators.util import spread
from ror_etl_spark.queries.util import ordered
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

_NGRAM_N = 3
_BOILER_MIN_DOCS = 5


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {_NGRAM_N}),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) - {_NGRAM_N - 2})) AS i FROM toks),
    grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[i : i + {_NGRAM_N - 1}], ' ') AS phrase
      FROM pos),
    freq AS (
      SELECT phrase, count(*) AS n_docs FROM grams GROUP BY phrase)
    SELECT phrase, n_docs FROM freq
    WHERE n_docs >= {_BOILER_MIN_DOCS}
    ORDER BY n_docs DESC, phrase
    LIMIT 50
    """,
    priority=2,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection (the C4 'repeated lines' rule,
    n-gram edition since this corpus is single-line): 3-gram phrases that
    appear in ≥5 distinct documents are template text, not content.
    Distinct-per-doc BEFORE the count means each doc votes once.

    Shuffle profile: only (doc_id, phrase-hash-sized string) pairs move;
    the groupBy count partial-aggregates map-side. At 100 TB you'd hash
    phrases to 64-bit before the shuffle and resolve strings for the
    survivors only — the plan shape is unchanged."""
    from ror_etl_spark.functions.text import word_ngrams

    d = spread(Tables(spark, sf_dir).documents)
    t = F.split(F.col("text"), " ")
    # word_ngrams, not transform(sequence, i -> slice(t, ...)): the indexed
    # lambda re-split the text once per position (see word_ngrams docstring)
    # r12 (guide §2.4): distinct-per-doc is a WITHIN-doc property — dedupe
    # the gram array map-side with array_distinct before exploding,
    # instead of a global (doc_id, phrase) distinct that shuffled the
    # whole gram stream once just to drop within-doc repeats. Each doc
    # still votes exactly once per phrase; one data-sized exchange gone.
    grams = d.filter(F.size(t) >= _NGRAM_N).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(t, _NGRAM_N))).alias("phrase"),
    )
    return (
        grams.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.asc("phrase"))
        .limit(50)
    )


@query(
    "text_repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
    bi AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
      FROM pos),
    cnt AS (
      SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram),
    top AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_c
      FROM cnt GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           round(top_c / n_bigrams, 4) AS top_share,
           (top_c / n_bigrams >= 0.05) AS is_repetitive
    FROM top
    ORDER BY doc_id
    """,
    priority=2,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rule: the share of the single most frequent
    bigram. Machine-generated / low-quality text repeats phrases; a top
    bigram covering ≥5% of all bigrams flags the doc.

    The question is entirely WITHIN-document, so no bigram ever leaves
    its row: sort the doc's bigram array and take the longest run
    (``sorted_runs``) — the former explode → groupBy(doc_id, bigram) →
    groupBy(doc_id) pair shuffled the whole bigram stream twice to
    compute a per-row scalar. Zero exchanges now; everything is codegen'd
    array arithmetic."""
    from ror_etl_spark.functions.text import run_counts, sorted_runs, word_ngrams

    d = spread(Tables(spark, sf_dir).documents)
    t = F.split(F.col("text"), " ")
    # word_ngrams, not transform(sequence, i -> element_at(t, ...)): the
    # indexed lambda re-split the text twice per position (word_ngrams
    # docstring); the joined strings are identical
    bg = d.filter(F.size(t) >= 2).select(
        "doc_id", F.array_sort(word_ngrams(t, 2)).alias("bg")
    )
    top = bg.select(
        "doc_id",
        F.size("bg").cast("long").alias("n_bigrams"),
        F.array_max(run_counts(sorted_runs(F.col("bg")))).alias("top_c"),
    )
    share = F.col("top_c") / F.col("n_bigrams")
    return top.select(
        "doc_id",
        "n_bigrams",
        F.round(share, 4).alias("top_share"),
        (share >= 0.05).alias("is_repetitive"),
    )


@query(
    "text_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    cnt AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    tot AS (
      SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id,
           round(-sum((c / n) * log2(c / n)), 4) AS token_entropy,
           count(*) AS n_unique
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id
    ORDER BY cnt.doc_id
    """,
    priority=2,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — a cheap
    perplexity proxy: near-zero entropy means degenerate repetition,
    unusually high means random token soup; both are filtered in
    pretraining pipelines. Everything is codegen'd array arithmetic on the
    doc's own row — no shuffle; the entropy sum is over ≤vocabulary-size
    terms so fp order can't move the 4-dp rounding."""
    from ror_etl_spark.functions.text import run_counts, sorted_runs

    d = spread(Tables(spark, sf_dir).documents)
    # within-document frequencies: sorted-array run lengths map-side
    # (sorted_runs docstring) — the former explode → groupBy(doc_id, tok)
    # → window-over-doc_id chain shuffled the token stream twice (plus a
    # third doc_id exchange for the window) for a per-row answer. The
    # entropy fold adds the identical -(c/n)·log2(c/n) terms, just in
    # sorted-token order; the sum is over ≤vocabulary-size terms so fp
    # order can't move the 4-dp rounding (same argument as before).
    st = d.select("doc_id", F.array_sort(F.split("text", " ")).alias("st"))
    cs = st.select(
        "doc_id",
        F.size("st").cast("double").alias("n"),
        run_counts(sorted_runs(F.col("st"))).alias("cs"),
    )
    n = F.col("n")
    entropy = F.aggregate(
        "cs", F.lit(0.0), lambda acc, c: acc - (c / n) * F.log2(c / n)
    )
    return cs.select(
        "doc_id",
        F.round(entropy, 4).alias("token_entropy"),
        F.size("cs").cast("long").alias("n_unique"),
    ).orderBy("doc_id")


@query(
    "c4_quality_rules",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             (n_chars - len(string_split(text, ' ')) + 1.0)
               / len(string_split(text, ' ')) AS mean_word_len
      FROM documents)
    SELECT doc_id,
           n_words,
           round(mean_word_len, 4) AS mean_word_len,
           (n_words >= 50) AS len_ok,
           (mean_word_len BETWEEN 3 AND 10) AS word_len_ok,
           (lang = 'en') AS lang_ok,
           (n_words >= 50 AND mean_word_len BETWEEN 3 AND 10 AND lang = 'en')
             AS keep
    FROM s
    ORDER BY doc_id
    """,
    priority=2,
)
def c4_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule filter, each rule surfaced as its own boolean column
    so downstream can audit WHY a doc was dropped (the pipeline-debugging
    shape real corpus builds use): minimum length, sane mean word length,
    language gate. mean_word_len is derived arithmetically from n_chars
    and the word count (chars minus separators over words) — no second
    pass over the text."""
    d = Tables(spark, sf_dir).documents
    n_words = F.size(F.split("text", " "))
    mean_wl = (F.col("n_chars") - n_words + F.lit(1.0)) / n_words
    len_ok = n_words >= 50
    wl_ok = (mean_wl >= 3) & (mean_wl <= 10)
    lang_ok = F.col("lang") == "en"
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        len_ok.alias("len_ok"),
        wl_ok.alias("word_len_ok"),
        lang_ok.alias("lang_ok"),
        (len_ok & wl_ok & lang_ok).alias("keep"),
    ).transform(ordered, "doc_id")


@query(
    "pii_redact_customers",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]{6,}', '[ID]', 'g') AS redacted,
           len(regexp_extract_all(c_name, '[0-9]{6,}')) AS n_id_runs,
           len(regexp_extract_all(
             c_name, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
             AS n_emails
    FROM customer
    ORDER BY c_custkey
    LIMIT 1000
    """,
    priority=2,
)
def pii_redact_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: replace long digit runs (account/customer numbers)
    with a placeholder and count email-shaped tokens (zero in this corpus
    — the detector still runs). Pure regexp codegen expressions; at
    100 TB this is embarrassingly parallel per-row compute with no
    shuffle at all (the ORDER BY+LIMIT here exists only to keep the
    checked result bounded)."""
    c = Tables(spark, sf_dir).customer
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    return (
        c.select(
            "c_custkey",
            F.regexp_replace("c_name", r"[0-9]{6,}", "[ID]").alias("redacted"),
            F.regexp_count("c_name", F.lit(r"[0-9]{6,}")).cast("long").alias("n_id_runs"),
            F.regexp_count("c_name", F.lit(email)).cast("long").alias("n_emails"),
        )
        .orderBy("c_custkey")
        .limit(1000)
    )


_DECON_N = 5  # n-gram size for contamination detection
_EVAL_MAX_ID = 25  # doc_id < 25 plays the held-out benchmark set


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {_DECON_N}),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) - {_DECON_N - 2})) AS i FROM toks),
    grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[i : i + {_DECON_N - 1}], ' ') AS g
      FROM pos),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id < {_EVAL_MAX_ID}),
    hits AS (
      SELECT grams.doc_id, count(*) AS n_shared
      FROM grams JOIN eval_grams USING (g)
      WHERE grams.doc_id >= {_EVAL_MAX_ID}
      GROUP BY grams.doc_id)
    SELECT doc_id, n_shared, (n_shared >= 3) AS contaminated
    FROM hits
    ORDER BY doc_id
    """,
    priority=2,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the pass every serious pretraining run
    does before training: find corpus documents sharing {n}-gram spans
    with a held-out evaluation set (here doc_id < 25 plays the benchmark)
    and flag likely leaks (≥3 distinct shared 5-grams). The eval side's
    distinct grams are tiny and BROADCAST, so the corpus side is a single
    map-side semi-join pass — no shuffle of corpus grams at all; that is
    the 100 TB shape (the benchmark is always driver-scale, the corpus
    never is). Reported per contaminated doc so the pipeline can drop or
    audit them."""
    from ror_etl_spark.functions.text import word_ngrams

    d = spread(Tables(spark, sf_dir).documents)
    t = F.split(F.col("text"), " ")
    # word_ngrams (slice/zip_with), not the indexed transform lambda — the
    # latter re-split the text once per position (word_ngrams docstring)
    # r12 (guide §2.4): within-doc gram dedupe moves map-side
    # (array_distinct before explode) — the global (doc_id, g) distinct
    # shuffled the whole gram stream once for a per-doc property. The
    # count after the broadcast semi-join is unchanged: rows are already
    # one per (doc, distinct gram).
    grams = d.filter(F.size(t) >= _DECON_N).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(t, _DECON_N))).alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") < _EVAL_MAX_ID).select("g").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") >= _EVAL_MAX_ID)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.select(
        "doc_id", "n_shared", (F.col("n_shared") >= 3).alias("contaminated")
    ).orderBy("doc_id")


@query(
    "llm_corpus_pipeline",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, text, n_chars,
             len(string_split(text, ' ')) AS n_words
      FROM documents
      WHERE len(string_split(text, ' ')) >= 50
        AND (n_chars - len(string_split(text, ' ')) + 1.0)
              / len(string_split(text, ' ')) BETWEEN 3 AND 10
        AND lang = 'en'),
    exact AS (
      SELECT * FROM kept
      WHERE doc_id IN (
        SELECT min(doc_id) FROM kept
        GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM exact),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) - {_DECON_N - 2})) AS i FROM toks),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i : i + {_DECON_N - 1}], ' ') AS g
      FROM pos),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id < {_EVAL_MAX_ID}),
    contaminated AS (
      SELECT grams.doc_id FROM grams JOIN eval_grams USING (g)
      WHERE grams.doc_id >= {_EVAL_MAX_ID}
      GROUP BY grams.doc_id HAVING count(*) >= 3),
    final AS (
      SELECT e.doc_id, e.n_words,
             CASE WHEN substr(md5(CAST(e.doc_id AS VARCHAR)), 1, 2) < '1a'
                  THEN 'test' ELSE 'train' END AS split
      FROM exact e
      WHERE e.doc_id >= {_EVAL_MAX_ID}
        AND e.doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT split, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_tokens
    FROM final GROUP BY split ORDER BY split
    """,
    priority=2,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-prep funnel as ONE declarative plan — quality
    rules → exact dedup (keep lowest doc_id per normalized fingerprint)
    → benchmark decontamination → leak-free holdout split → per-split
    doc/token counts. Each stage is the already-verified operator, but
    chaining them in a single DataFrame expression is the point: Catalyst
    sees the full pipeline, so the text column is read once, filters
    merge into the scan, and the only shuffles are the dedup groupBy and
    the gram semi-join. This is the shape a 100 TB corpus build actually
    runs — not N materialized intermediate tables.

    Eval docs (doc_id < 25) are excluded from the OUTPUT corpus but vote
    their n-grams into the contamination index."""
    from ror_etl_spark.functions.text import fingerprint_md5, word_ngrams

    d = spread(Tables(spark, sf_dir).documents)
    t = F.split(F.col("text"), " ")
    n_words = F.size(t)
    mean_wl = (F.col("n_chars") - n_words + F.lit(1.0)) / n_words
    kept = d.filter(
        (n_words >= 50) & (mean_wl >= 3) & (mean_wl <= 10) & (F.col("lang") == "en")
    ).select("doc_id", "text", n_words.alias("n_words"))
    # keep-lowest-doc_id per fingerprint as ONE hash aggregate:
    # min(struct(doc_id, ...)) short-circuits on the unique doc_id, so it
    # picks exactly the row the former row_number window kept — but as a
    # partially-aggregated HashAggregate instead of a full per-partition
    # SORT of fat text rows under the same exchange (guide §2.3,
    # aggregate before you shuffle; r12: Sort+Window → HashAggregate).
    exact = (
        kept.groupBy(fingerprint_md5(F.col("text")).alias("fp"))
        .agg(F.min(F.struct("doc_id", "text", "n_words")).alias("r"))
        .select("r.doc_id", "r.text", "r.n_words")
    )
    # word_ngrams (slice/zip_with), not the indexed transform lambda — the
    # latter re-split the text once per position (word_ngrams docstring);
    # survivors of the quality gate always have >= 50 >= _DECON_N words
    grams = exact.select(
        "doc_id",
        F.explode(word_ngrams(F.split(F.col("text"), " "), _DECON_N)).alias("g"),
    )
    # r12 (guide §2.3/§2.4): no global distinct on the full gram stream —
    # that was a data-sized shuffle of every (doc_id, 8-gram) pair whose
    # only job was de-duplicating within-doc repeats. The broadcast
    # semi-join drops non-matching grams map-side, so only MATCHED grams
    # (bounded by eval-doc vocabulary) reach a shuffle, and
    # count_distinct(g) per doc counts exactly what the old
    # distinct-then-count counted.
    eval_grams = grams.filter(F.col("doc_id") < _EVAL_MAX_ID).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") >= _EVAL_MAX_ID)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("ns"))
        .filter(F.col("ns") >= 3)
        .select("doc_id")
    )
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a", "test"
    ).otherwise("train")
    final = (
        exact.filter(F.col("doc_id") >= _EVAL_MAX_ID)
        .join(contaminated, "doc_id", "left_anti")
        .select(split.alias("split"), "n_words")
    )
    return (
        final.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
        )
    )


@query(
    "llm_unigram_surprisal_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents),
    freq AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT sum(c) AS t FROM freq)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(-ln(f.c / tot.t)) + 1e-9, 4) AS surprisal,
           round(avg(-ln(f.c / tot.t)) + 1e-9, 4) <= 3.45 AS keep
    FROM toks JOIN freq f USING (w) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    priority=3,
)
def llm_unigram_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style corpus filtering with a SELF-TRAINED unigram LM
    (the CCNet recipe's shape, with the corpus itself as the LM): each
    document's mean token surprisal ``avg(-ln c(w)/T)`` under the
    corpus unigram distribution; rare-token-heavy documents score high
    and are dropped (keep = surprisal ≤ 3.45 nats — splits the driver
    corpus around its upper quartile).

    Scale shape: token explode → unigram counts (map-side combined
    aggregate — the "LM training" is one pass) → join the counts back
    on the token (AQE broadcasts a closed vocabulary; an open Heaps-law
    vocabulary degrades gracefully to a shuffle join keyed on the
    token) → per-document average. Only (doc_id, token) pairs move;
    the token expansion is lazily checkpointed because both the count
    aggregate and the join probe consume it. The keep flag derives from
    the ROUNDED surprisal on both engines, so the epsilon-shifted 4dp
    rounding that absorbs summation-order ulps also makes the boolean
    bit-replayable."""
    from ror_etl_spark.functions.text import tokens

    d = spread(Tables(spark, sf_dir).documents)
    toks = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .localCheckpoint(eager=False)
    )
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    surprisal = F.round(F.avg(-F.log(F.col("c") / F.col("t"))) + 1e-9, 4)
    per = (
        toks.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            surprisal.alias("surprisal"),
        )
    )
    return per.select(
        "doc_id", "n_tokens", "surprisal", (F.col("surprisal") <= 3.45).alias("keep")
    ).orderBy("doc_id")


@query(
    "llm_bigram_surprisal_filter",
    oracle="""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents),
    toks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INT)] AS w
      FROM (SELECT doc_id, string_split(s, ' ') AS ws,
                   unnest(range(1, len(string_split(s, ' ')) + 1)) AS i
            FROM d)),
    uni AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT sum(c) AS t FROM uni),
    big AS (
      SELECT a.doc_id, a.w AS u, b.w AS v
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    bc AS (SELECT u, v, count(*) AS cb FROM big GROUP BY u, v),
    terms AS (
      SELECT toks.doc_id, -ln(uni.c / tot.t) AS term
      FROM toks JOIN uni USING (w) CROSS JOIN tot
      WHERE toks.pos = 1
      UNION ALL
      SELECT big.doc_id,
             -ln(0.75 * bc.cb / cu.c + 0.25 * cv.c / tot.t) AS term
      FROM big
      JOIN bc USING (u, v)
      JOIN uni cu ON cu.w = big.u
      JOIN uni cv ON cv.w = big.v
      CROSS JOIN tot)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(term) + 1e-9, 4) AS surprisal,
           round(avg(term) + 1e-9, 4) <= 3.43 AS keep
    FROM terms
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    priority=3,
)
def llm_bigram_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filtering one step closer to CCNet's actual recipe
    (a 5-gram KenLM): a SELF-TRAINED Jelinek-Mercer interpolated BIGRAM
    LM. Token 1 is scored by the corpus unigram distribution; token i>1
    by ``-ln(λ·c(w_{i-1} w_i)/c(w_{i-1}) + (1-λ)·c(w_i)/T)`` with
    λ = 0.75 (exact in binary, so both engines compute identical terms);
    a document's surprisal is the mean over its tokens, and high-mean
    (incoherent / rare-sequence) documents are dropped (keep = surprisal ≤ 3.43 nats ≈ the corpus p90 at
    every testdata SF, the drop-the-worst-tail shape). Interpolation
    keeps every term finite — unseen bigrams back off to the unigram
    mass — and all LM statistics are exact integer counts, so the DuckDB
    oracle replays the whole model from SQL aggregates.

    Scale shape (the 100 TB path): token and bigram expansions are
    map-side array ops (posexplode / zip of adjacent slices — no window
    shuffle for the previous-token pairing); LM "training" is two
    map-side-combined count aggregates; scoring joins the counts back
    keyed on token/bigram (AQE broadcasts closed vocabularies, shuffle
    join under open Heaps-law growth); the per-document mean is one
    final doc-keyed aggregate. Only (doc_id, token) and (doc_id,
    bigram) pairs ever move; the bigram expansion is lazily checkpointed
    because both the count aggregate and the scoring probe consume it.
    The keep flag derives from the epsilon-shifted 4dp-rounded surprisal
    on both engines (absorbs summation-order ulps; bit-replayable
    boolean)."""
    from ror_etl_spark.functions.text import tokens

    d = spread(Tables(spark, sf_dir).documents)
    t = tokens(F.col("text"))
    toks = (
        d.select("doc_id", F.posexplode(t).alias("pos0", "w"))
        .localCheckpoint(eager=False)
    )
    bigr = (
        d.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, F.size(t) - 1).alias("u"),
                    F.slice(t, 2, F.size(t) - 1).alias("v"),
                )
            ).alias("uv"),
        )
        .select("doc_id", F.col("uv.u").alias("u"), F.col("uv.v").alias("v"))
        .localCheckpoint(eager=False)
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").alias("t"))
    bc = bigr.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cb"))
    first = (
        toks.filter(F.col("pos0") == 0)
        .join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", (-F.log(F.col("c") / F.col("t"))).alias("term"))
    )
    cu = uni.select(F.col("w").alias("u"), F.col("c").alias("cu"))
    cv = uni.select(F.col("w").alias("v"), F.col("c").alias("cv"))
    rest = (
        bigr.join(bc, ["u", "v"])
        .join(cu, "u")
        .join(cv, "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (
                -F.log(
                    F.lit(0.75) * F.col("cb") / F.col("cu")
                    + F.lit(0.25) * F.col("cv") / F.col("t")
                )
            ).alias("term"),
        )
    )
    per = (
        first.unionAll(rest)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.round(F.avg("term") + 1e-9, 4)).alias("surprisal"),
        )
    )
    return per.select(
        "doc_id", "n_tokens", "surprisal", (F.col("surprisal") <= 3.43).alias("keep")
    ).transform(ordered, "doc_id")


@query(
    "corpus_shard_shuffle",
    oracle="""
    SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 16 AS shard,
           CAST(row_number() OVER (
             PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 16
             ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shard_pos,
           doc_id
    FROM documents
    ORDER BY shard, shard_pos
    """,
    priority=3,
)
def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffling for training: every document gets a
    SHARD (content-hash of its id, so assignment is stable under
    re-partitioning and re-runs — the property ``df.sample``/``rand()``
    lack) and a position within the shard drawn from an EPOCH-SALTED
    hash — re-keying the salt ('epoch1:', ...) produces a fresh
    independent permutation without touching the data, which is how a
    100 TB corpus is re-shuffled per epoch: metadata-only.

    Scale shape: one shuffle keyed by shard; the per-shard ``row_number``
    is the order a per-shard writer emits examples (shard ≡ output file),
    so the global sort a naive ORDER BY rand() would need never happens.
    In production the shard count is sized to the writer parallelism
    (16 here keeps the oracle's window small); both the assignment and
    the permutation are md5-based and replayed exactly by the DuckDB
    oracle."""
    id_str = F.col("doc_id").cast("string")
    shard = (
        F.conv(F.substring(F.md5(id_str), 1, 2), 16, 10).cast("long") % 16
    ).alias("shard")
    order_key = F.md5(F.concat(F.lit("epoch0:"), id_str))
    d = spread(Tables(spark, sf_dir).documents)
    w = Window.partitionBy("shard").orderBy(order_key, "doc_id")
    return (
        d.select(shard, "doc_id")
        .select(
            "shard",
            F.row_number().over(w).cast("long").alias("shard_pos"),
            "doc_id",
        )
        .transform(ordered, "shard", "shard_pos")
    )


@query(
    "corpus_shard_manifest",
    oracle="""
    WITH assigned AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 16
               AS shard,
             n_chars,
             ('0x' || substr(md5(text), 1, 8))::BIGINT & 2147483647 AS h_hi,
             ('0x' || substr(md5(text), 9, 8))::BIGINT & 2147483647 AS h_lo
      FROM documents)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(bit_xor(h_hi) AS BIGINT) AS xor_hi,
           CAST(bit_xor(h_lo) AS BIGINT) AS xor_lo
    FROM assigned GROUP BY shard ORDER BY shard
    """,
    priority=3,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export manifest for the sharded corpus: per shard (same
    content-hash assignment as ``corpus_shard_shuffle``), the document
    count, total characters, and an ORDER-FREE content checksum — the
    XOR fold of each document's md5 halves. The manifest is what the
    consumer of an exported corpus verifies against: any dropped,
    duplicated, or bit-flipped document changes the XOR; any re-ordering
    does not (XOR is commutative), so the checksum is stable no matter
    which executor wrote which rows in which order — the property a
    concatenation/rolling digest does NOT have and the reason it can't
    be computed distributed.

    Scale shape: one map pass (md5 per row) + ONE map-side-combined
    aggregate keyed on shard — constant state per shard, no sort, no
    window; at 100 TB the reduce is |shards| rows. 31-bit halves keep
    the values positive and identical under Spark's signed longs and
    DuckDB's BIGINT."""
    d = spread(Tables(spark, sf_dir).documents)
    mask = F.lit(2147483647)

    def half(pos: int):
        return F.conv(F.substring(F.md5(F.col("text")), pos, 8), 16, 10).cast(
            "long"
        ).bitwiseAND(mask)

    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long") % 16
    )
    return (
        d.select(
            shard.alias("shard"),
            "n_chars",
            half(1).alias("h_hi"),
            half(9).alias("h_lo"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("bit_xor(h_hi)").alias("xor_hi"),
            F.expr("bit_xor(h_lo)").alias("xor_lo"),
        )
        .orderBy("shard")
    )


@query(
    "quality_report_by_source",
    oracle="""
    WITH s AS (
      SELECT source, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             (n_chars - len(string_split(text, ' ')) + 1.0)
               / len(string_split(text, ' ')) AS mean_word_len
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_words >= 50 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_too_short,
           CAST(sum(CASE WHEN mean_word_len BETWEEN 3 AND 10 THEN 0 ELSE 1 END)
             AS BIGINT) AS n_bad_word_len,
           CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
             AS n_non_en,
           CAST(sum(CASE WHEN n_words >= 50 AND mean_word_len BETWEEN 3 AND 10
                          AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(sum(CASE WHEN n_words >= 50 AND mean_word_len BETWEEN 3 AND 10
                          AND lang = 'en' THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS keep_rate
    FROM s GROUP BY source ORDER BY source
    """,
    priority=3,
)
def quality_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE quality dashboard: the C4 rule outcomes rolled up by
    provenance — documents counted against each failing rule plus the
    keep rate. This is the view a crawl owner actually reads (which
    source is dragging the corpus, which rule is doing the dragging)
    before cutting a domain or re-tuning a threshold; the per-document
    flags (``c4_quality_rules``) are its drill-down.

    Scale shape: the rule math is per-row codegen (no explode —
    whitespace counting via char arithmetic), then ONE map-side-
    combined aggregate keyed on source. Nothing document-sized
    shuffles; the output is |sources| rows."""
    d = Tables(spark, sf_dir).documents
    n_words = F.size(F.split(F.col("text"), " "))
    mwl = (F.col("n_chars") - n_words + 1.0) / n_words
    keep = (
        (n_words >= 50) & mwl.between(3, 10) & (F.col("lang") == "en")
    ).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(n_words >= 50, 0).otherwise(1)).alias("n_too_short"),
            F.sum(F.when(mwl.between(3, 10), 0).otherwise(1)).alias(
                "n_bad_word_len"
            ),
            F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("n_non_en"),
            F.sum(keep).alias("n_kept"),
            F.round(
                F.sum(keep) / F.count(F.lit(1)).cast("double") + 1e-9, 6
            ).alias("keep_rate"),
        )
        .orderBy("source")
    )
