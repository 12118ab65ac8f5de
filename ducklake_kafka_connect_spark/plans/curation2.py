"""Web-corpus curation, wave 2: C4-style quality gates, URL
canonicalization dedup, and PII redaction accounting.

These are the remaining standard passes of a pre-training data pipeline
(C4/Gopher lineage — Raffel et al. 2020 §2.2, Rae et al. 2021 A.1.1)
that wave 1 (``plans/curation.py``) did not cover. The synthetic
``documents`` table carries no URLs or PII, so those queries synthesize
the columns DETERMINISTICALLY from ``doc_id``/``source`` — both engines
derive identical inputs, keeping the DuckDB oracles exact rather than
statistical.

Determinism conventions (round-workflow): integer ``//`` for ratio
micro-units (never float FLOOR at boundaries), per-row integerization
before any cross-row sum, and regexp patterns restricted to the
class/quantifier subset where Java regex (Spark) and RE2 (DuckDB) agree
— with DuckDB's ``'g'`` flag spelled explicitly since its
``regexp_replace`` is first-match-only by default while Spark's is
global.

Scale: every query is one scan + one hash aggregate keyed by
``source``/host (map-side combined, state = |sources| × a few longs);
the per-doc computations are single codegen'd expressions — no UDFs, no
joins except a final ≤|sources|-row ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import WORDS_SQL
from .queries import _t, register
from ..lake.relation_cache import local_rows_df

# C4-style gates, adapted to the synthetic corpus' signal: a minimum
# word count, an English-stopword presence check (C4 drops pages
# without natural-language glue words), and a mean-word-length band
# (Gopher's 3-10 char gate, narrowed to this corpus' 3-6 band so the
# filter discriminates).
MIN_WORDS = 30
MWL_LO = 3_000_000  # mean word length, micro-chars
MWL_HI = 6_000_000


@register(
    "c4_quality_filters",
    f"""
    WITH split AS (
      SELECT source, {WORDS_SQL.format(text="text")} AS w FROM documents
    ),
    per_doc AS (
      SELECT source,
             len(w) AS n_words,
             list_contains(w, 'the') AND list_contains(w, 'a') AS has_stop,
             CAST((1000000 * list_sum(list_transform(w, x -> length(x))))
                  // len(w) AS BIGINT) AS mwl_micro
      FROM split WHERE len(w) > 0
    ),
    gated AS (
      SELECT source,
             CASE WHEN n_words >= {MIN_WORDS} THEN 1 ELSE 0 END AS f_words,
             CASE WHEN has_stop THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN mwl_micro BETWEEN {MWL_LO} AND {MWL_HI}
                  THEN 1 ELSE 0 END AS f_mwl
      FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_words) AS BIGINT) AS n_min_words,
           CAST(sum(f_stop) AS BIGINT) AS n_stopword,
           CAST(sum(f_mwl) AS BIGINT) AS n_wordlen,
           CAST(sum(f_words * f_stop * f_mwl) AS BIGINT) AS n_clean
    FROM gated GROUP BY source ORDER BY source
    """,
    "C4-style quality gates per source: minimum word count, stopword "
    "presence ('the' AND 'a'), and a mean-word-length band "
    "(integer-micro, exact) — per-gate pass counts plus the all-gates "
    "survivor count",
)
def c4_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan → per-doc codegen exprs → one hash aggregate by source.
    The mean-word-length micro-ratio uses integer division so both
    engines land on identical BIGINTs (no float-floor boundary drift)."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    per_doc = docs.select(
        "source",
        F.size(words).alias("n_words"),
        (
            F.array_contains(words, "the") & F.array_contains(words, "a")
        ).alias("has_stop"),
        F.expr(
            f"CAST((1000000 * aggregate(split(trim(lower(text)), '\\\\s+'), "
            f"0L, (acc, x) -> acc + length(x))) "
            f"DIV size(split(trim(lower(text)), '\\\\s+')) AS BIGINT)"
        ).alias("mwl_micro"),
    ).filter(F.col("n_words") > 0)
    gated = per_doc.select(
        "source",
        F.when(F.col("n_words") >= MIN_WORDS, 1).otherwise(0).alias("f_words"),
        F.when(F.col("has_stop"), 1).otherwise(0).alias("f_stop"),
        F.when(
            F.col("mwl_micro").between(MWL_LO, MWL_HI), 1
        ).otherwise(0).alias("f_mwl"),
    )
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_words").cast("long").alias("n_min_words"),
            F.sum("f_stop").cast("long").alias("n_stopword"),
            F.sum("f_mwl").cast("long").alias("n_wordlen"),
            F.sum(F.col("f_words") * F.col("f_stop") * F.col("f_mwl"))
            .cast("long")
            .alias("n_clean"),
        )
        .orderBy("source")
    )


# Deterministic URL synthesis: host case noise, stable path, interleaved
# utm_* tracking params — the canonicalizer must lowercase the host,
# strip every utm_* pair, and normalize the dangling separator.
_URL_SQL = (
    "'HTTPS://' || upper(source) || '.Example.COM/p/' || "
    "CAST(doc_id % 50 AS {int_t}) || '?utm_source=s' || "
    "CAST(doc_id % 3 AS {int_t}) || '&page=' || "
    "CAST(doc_id % 4 AS {int_t}) || '&utm_campaign=c' || "
    "CAST(doc_id % 2 AS {int_t})"
)
# three-step canonicalization, identical in both engines: (1) drop
# mid/trailing &utm_* pairs, (2) a leading ?utm_*& collapses to the
# bare '?' so the next surviving param keeps query position, (3) a
# dangling '?' (all params were tracking) drops
_UTM_MID = "[&]utm_[a-z]+=[a-z0-9]*"
_UTM_LEAD = "[?]utm_[a-z]+=[a-z0-9]*[&]?"
_DANGLING_Q = "[?]$"


@register(
    "url_canonicalize_dedup",
    f"""
    WITH raw AS (
      SELECT doc_id, source,
             {_URL_SQL.format(int_t="VARCHAR")} AS url
      FROM documents
    ),
    canon AS (
      SELECT source,
             regexp_replace(regexp_replace(regexp_replace(
               lower(url), '{_UTM_MID}', '', 'g'),
               '{_UTM_LEAD}', '?', 'g'),
               '{_DANGLING_Q}', '', 'g') AS curl
      FROM raw
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
           CAST((1000000 * (count(*) - count(DISTINCT curl)))
                // count(*) AS BIGINT) AS dup_rate_micro
    FROM canon GROUP BY source ORDER BY source
    """,
    "URL canonicalization dedup per source: lowercase the host, strip "
    "utm_* tracking params, normalize the dangling separator — raw vs "
    "canonical-distinct counts and the integer-micro duplicate rate "
    "(URLs synthesized deterministically from doc_id/source)",
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first pass of every web-crawl pipeline: collapse tracking-
    param and case variants before content dedup. One scan, string
    codegen, one aggregate; distinct-count shuffles on (source, curl)."""
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        "source", F.expr(_URL_SQL.format(int_t="STRING")).alias("url")
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("url")), _UTM_MID, ""),
            _UTM_LEAD,
            "?",
        ),
        _DANGLING_Q,
        "",
    )
    return (
        raw.select("source", curl.alias("curl"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("curl").alias("n_canonical"),
            F.expr(
                "CAST((1000000 * (count(1) - count(DISTINCT curl))) "
                "DIV count(1) AS BIGINT)"
            ).alias("dup_rate_micro"),
        )
        .orderBy("source")
    )


# PII synthesis: ~1/5 docs get an email, ~1/7 an internal IPv4, ~1/11 a
# phone number — all derived from doc_id so both engines see byte-equal
# text. Patterns stay in the Java-regex ∩ RE2 subset.
_PII_AUG_SQL = (
    "text || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || "
    "CAST(doc_id AS {int_t}) || '@mail.example.com now' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || "
    "CAST(doc_id % 256 AS {int_t}) || '.25' ELSE '' END || "
    "CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS {int_t}), 4, '0') ELSE '' END"
)
_EMAIL_PAT = "[a-z0-9]+@[a-z0-9.]+[a-z]"
_IP_PAT = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PHONE_PAT = "\\+1-555-[0-9]{4}"


@register(
    "pii_redaction_stats",
    f"""
    WITH aug AS (
      SELECT source, {_PII_AUG_SQL.format(int_t="VARCHAR")} AS t
      FROM documents
    ),
    hits AS (
      SELECT source,
             len(regexp_extract_all(t, '{_EMAIL_PAT}')) AS n_email,
             len(regexp_extract_all(t, '{_IP_PAT}')) AS n_ip,
             len(regexp_extract_all(t, '{_PHONE_PAT}')) AS n_phone,
             length(t) - length(
               regexp_replace(regexp_replace(regexp_replace(
                 t, '{_EMAIL_PAT}', '', 'g'), '{_IP_PAT}', '', 'g'),
                 '{_PHONE_PAT}', '', 'g')) AS redacted_chars
      FROM aug
    )
    SELECT source,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(redacted_chars) AS BIGINT) AS redacted_chars,
           CAST(sum(CASE WHEN n_email + n_ip + n_phone > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
    FROM hits GROUP BY source ORDER BY source
    """,
    "PII scrub accounting per source: email/IPv4/phone regex hit "
    "counts, total characters a redaction pass removes, and the count "
    "of affected documents (PII synthesized deterministically from "
    "doc_id; patterns in the Java-regex/RE2 common subset)",
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compliance pass of a training-data pipeline, measured rather
    than guessed: how much text a redactor removes and where. Single
    scan; the three patterns run as codegen'd regexp exprs (no UDF); at
    100 TB the same expressions ride a mapInPandas-free column pipeline
    with state = |sources| rows."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "source", F.expr(_PII_AUG_SQL.format(int_t="STRING")).alias("t")
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_PAT, ""), _IP_PAT, ""
        ),
        _PHONE_PAT,
        "",
    )
    hits = aug.select(
        "source",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_PAT)).alias("n_email"),
        F.regexp_count(F.col("t"), F.lit(_IP_PAT)).alias("n_ip"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_PAT)).alias("n_phone"),
        (F.length("t") - F.length(redacted)).alias("redacted_chars"),
    )
    return (
        hits.groupBy("source")
        .agg(
            F.sum("n_email").cast("long").alias("n_emails"),
            F.sum("n_ip").cast("long").alias("n_ips"),
            F.sum("n_phone").cast("long").alias("n_phones"),
            F.sum("redacted_chars").cast("long").alias("redacted_chars"),
            F.sum(
                F.when(
                    F.col("n_email") + F.col("n_ip") + F.col("n_phone") > 0, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_docs_with_pii"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# Train/val/test split + leakage audit
# ---------------------------------------------------------------------------

# hash-stable split: first 60 md5 bits of the doc key, mod 100 →
# 0-89 train, 90-94 val, 95-99 test
_H60_DOC_SQL = (
    "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)
_SPLIT_CASE_SQL = (
    f"CASE WHEN ({_H60_DOC_SQL} % 100) < 90 THEN 'train' "
    f"WHEN ({_H60_DOC_SQL} % 100) < 95 THEN 'val' ELSE 'test' END"
)


@register(
    "dataset_split_leakage",
    f"""
    WITH assigned AS (
      SELECT doc_id, md5(text) AS th, {_SPLIT_CASE_SQL} AS split
      FROM documents
    ),
    split_counts AS (
      SELECT split, count(*) AS n FROM assigned GROUP BY split
    ),
    pairs AS (
      SELECT a.split AS s1, b.split AS s2
      FROM assigned a JOIN assigned b
        ON a.th = b.th AND a.doc_id < b.doc_id
    )
    SELECT split,
           CAST(n AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM pairs WHERE s1 <> s2) AS BIGINT)
             AS n_cross_split_dup_pairs,
           CAST((SELECT count(*) FROM pairs WHERE s1 = s2) AS BIGINT)
             AS n_within_split_dup_pairs
    FROM split_counts ORDER BY split
    """,
    "Hash-stable 90/5/5 train/val/test assignment (first 60 md5 bits of "
    "doc_id mod 100) with a leakage audit: exact-duplicate text pairs "
    "that cross a split boundary (train/test contamination) vs pairs "
    "contained within one split",
)
def dataset_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split must be a pure function of a stable key (doc_id), never
    of row order — re-running on a grown corpus keeps every old doc's
    assignment. Leakage = exact-text duplicates straddling splits; the
    self-join runs on md5(text), so only hash-collapsed duplicate groups
    join (|dup groups| rows), never the corpus against itself."""
    from ..operators.dedup import h60_col

    docs = _t(spark, sf_dir, "documents")
    h = h60_col(F.col("doc_id").cast("string")) % 100
    assigned = docs.select(
        "doc_id",
        F.md5("text").alias("th"),
        F.when(h < 90, "train")
        .when(h < 95, "val")
        .otherwise("test")
        .alias("split"),
    )
    assigned.persist()
    split_counts = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    a = assigned.select(
        F.col("doc_id").alias("id_a"), "th", F.col("split").alias("s1")
    )
    b = assigned.select(
        F.col("doc_id").alias("id_b"), "th", F.col("split").alias("s2")
    )
    pairs = a.join(b, "th").filter(F.col("id_a") < F.col("id_b"))
    leak = pairs.agg(
        F.coalesce(
            F.sum(F.when(F.col("s1") != F.col("s2"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_cross_split_dup_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("s1") == F.col("s2"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_within_split_dup_pairs"),
    )
    return (
        split_counts.crossJoin(F.broadcast(leak))
        .select(
            "split",
            "n_docs",
            "n_cross_split_dup_pairs",
            "n_within_split_dup_pairs",
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Context packing accounting
# ---------------------------------------------------------------------------

CTX_TOKENS = 512  # context window, whitespace-token units


@register(
    "context_packing_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, len({WORDS_SQL.format(text="text")}) AS n_tok
      FROM documents
    ),
    capped AS (
      SELECT doc_id, CASE WHEN n_tok > {CTX_TOKENS} THEN {CTX_TOKENS}
                          ELSE n_tok END AS n_tok
      FROM toks
    ),
    packed AS (
      SELECT doc_id, n_tok,
             CAST((sum(n_tok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok) // {CTX_TOKENS} AS BIGINT) AS pack_id
      FROM capped
    ),
    per_pack AS (
      SELECT pack_id, count(*) AS n_docs, sum(n_tok) AS toks
      FROM packed GROUP BY pack_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(min(n_docs) AS BIGINT) AS min_docs_per_pack,
           CAST(max(n_docs) AS BIGINT) AS max_docs_per_pack,
           CAST((1000000 * sum(toks)) // (count(*) * {CTX_TOKENS})
                AS BIGINT) AS fill_rate_micro
    FROM per_pack
    """,
    "Deterministic sequence-packing accounting: docs token-capped to "
    "the context width, assigned pack ids by cumulative-token offset "
    "DIV context (offset packing in doc_id order), then pack count, doc "
    "spread, and the integer-micro fill rate",
)
def context_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset packing (pack = cumulative-token-start DIV context) is the
    distributed-friendly packing rule: no sequential first-fit state.
    The global prefix sum is computed the distributed way, NOT with an
    unpartitioned window (which funnels the corpus through one task):
    two passes — per-bucket local cumsums in parallel (window
    PARTITIONED by a doc_id range bucket), then a bucket-offset table
    that is |buckets| rows (the only unpartitioned window, trivially
    small) broadcast back. Identical result, corpus-parallel plan."""
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    bucket = (F.col("doc_id") / 10_000).cast("long")
    capped = docs.select(
        "doc_id",
        bucket.alias("b"),
        F.least(F.size(words), F.lit(CTX_TOKENS)).alias("n_tok"),
    )
    local_cum = F.sum("n_tok").over(
        W.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = capped.select("b", "n_tok", (local_cum - F.col("n_tok")).alias("lstart"))
    bucket_tot = capped.groupBy("b").agg(F.sum("n_tok").alias("btot"))
    offsets = bucket_tot.select(
        "b",
        (
            F.sum("btot").over(
                W.orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            - F.col("btot")
        ).alias("boff"),
    )
    packed = local.join(F.broadcast(offsets), "b").select(
        "n_tok",
        F.floor((F.col("lstart") + F.col("boff")) / CTX_TOKENS)
        .cast("long")
        .alias("pack_id"),
    )
    per_pack = packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("toks")
    )
    return per_pack.agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.min("n_docs").cast("long").alias("min_docs_per_pack"),
        F.max("n_docs").cast("long").alias("max_docs_per_pack"),
        F.expr(
            f"CAST((1000000 * sum(toks)) DIV (count(1) * {CTX_TOKENS}) AS BIGINT)"
        ).alias("fill_rate_micro"),
    )


# ---------------------------------------------------------------------------
# Distribution profiling: exact percentiles + filter-calibration sweep
# ---------------------------------------------------------------------------

_PCTS = (50, 90, 99)


@register(
    "length_percentiles_by_lang",
    f"""
    WITH ranked AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_docs,
           {", ".join(
             f"CAST(max(CASE WHEN rn = ((n - 1) * {p}) // 100 + 1 "
             f"THEN n_chars END) AS BIGINT) AS p{p}_chars"
             for p in _PCTS
           )}
    FROM ranked GROUP BY lang ORDER BY lang
    """,
    "Exact (discrete-rule) p50/p90/p99 document-length percentiles per "
    "language: value at 1-based position floor((n-1)*p/100)+1 of the "
    "(n_chars, doc_id)-sorted frame — deterministic, no interpolation",
)
def length_percentiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling for corpus QA dashboards. One window per
    lang partition (parallel across langs), then a max-case aggregate;
    the discrete rule (no interpolation) keeps both engines bit-equal.
    At scale: approx sketches (approx_percentile) replace this when a
    ±1% answer is acceptable — this operator is the exact auditor."""
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_docs")]
    for p in _PCTS:
        # integer DIV on both engines: DuckDB CAST(x/100) ROUNDS while a
        # Spark long cast truncates — float division here is the trap
        pos = F.expr(f"((n - 1) * {p}) DIV 100") + 1
        aggs.append(
            F.max(F.when(F.col("rn") == pos, F.col("n_chars")))
            .cast("long")
            .alias(f"p{p}_chars")
        )
    return ranked.groupBy("lang").agg(*aggs).orderBy("lang")


# mean-word-length thresholds swept (micro-chars): the calibration curve
# a filter designer reads before picking the C4 gate
_SWEEP_THRESHOLDS = (3_000_000, 3_500_000, 4_000_000, 4_500_000, 5_000_000, 6_000_000)


@register(
    "filter_threshold_sweep",
    f"""
    WITH split AS (
      SELECT doc_id, {WORDS_SQL.format(text="text")} AS w FROM documents
    ),
    per_doc AS (
      SELECT len(w) AS n_words,
             CAST((1000000 * list_sum(list_transform(w, x -> length(x))))
                  // len(w) AS BIGINT) AS mwl_micro
      FROM split WHERE len(w) > 0
    ),
    th AS (
      SELECT unnest([{", ".join(str(t) for t in _SWEEP_THRESHOLDS)}]) AS threshold
    )
    SELECT th.threshold,
           CAST(sum(CASE WHEN d.mwl_micro >= th.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_retained,
           CAST(sum(CASE WHEN d.mwl_micro >= th.threshold THEN d.n_words
                         ELSE 0 END) AS BIGINT) AS tokens_retained,
           CAST((1000000 * sum(CASE WHEN d.mwl_micro >= th.threshold
                                    THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS retention_micro
    FROM per_doc d CROSS JOIN th
    GROUP BY th.threshold ORDER BY th.threshold
    """,
    "Filter-calibration sweep: for each mean-word-length threshold, the "
    "documents and tokens a >=threshold gate would retain plus the "
    "integer-micro retention rate — the curve read before fixing a "
    "quality-gate cutoff",
)
def filter_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan computes the per-doc statistic; the sweep is a broadcast
    cross join against a 6-row literal threshold frame folded into one
    hash aggregate — adding thresholds never adds passes over the
    corpus."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    per_doc = docs.select(
        F.size(words).alias("n_words"),
        F.expr(
            "CAST((1000000 * aggregate(split(trim(lower(text)), '\\\\s+'), "
            "0L, (acc, x) -> acc + length(x))) "
            "DIV size(split(trim(lower(text)), '\\\\s+')) AS BIGINT)"
        ).alias("mwl_micro"),
    ).filter(F.col("n_words") > 0)
    th = local_rows_df(spark, 
        [(t,) for t in _SWEEP_THRESHOLDS], "threshold long"
    )
    retained = F.when(F.col("mwl_micro") >= F.col("threshold"), 1).otherwise(0)
    return (
        per_doc.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(retained).cast("long").alias("docs_retained"),
            F.sum(
                F.when(
                    F.col("mwl_micro") >= F.col("threshold"), F.col("n_words")
                ).otherwise(0)
            )
            .cast("long")
            .alias("tokens_retained"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN mwl_micro >= threshold THEN 1 "
                "ELSE 0 END)) DIV count(1) AS BIGINT)"
            ).alias("retention_micro"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# Provenance: which sources duplicate which
# ---------------------------------------------------------------------------


PREFIX_FP_WORDS = 6  # opening-words fingerprint width


@register(
    "cross_source_dup_matrix",
    f"""
    WITH hashed AS (
      SELECT doc_id, source,
             md5(array_to_string(
               {WORDS_SQL.format(text="text")}[1:{PREFIX_FP_WORDS}], ' '
             )) AS th
      FROM documents
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM hashed a JOIN hashed b
        ON a.th = b.th AND a.doc_id < b.doc_id
      WHERE a.source <> b.source
    )
    SELECT CASE WHEN src_a < src_b THEN src_a ELSE src_b END AS source_lo,
           CASE WHEN src_a < src_b THEN src_b ELSE src_a END AS source_hi,
           CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM pairs
    GROUP BY 1, 2
    ORDER BY n_dup_pairs DESC, source_lo, source_hi
    LIMIT 50
    """,
    "Cross-source duplication provenance: for every source pair, the "
    "number of document pairs sharing a 6-word opening fingerprint "
    "(boilerplate/copy detection) — top 50 by pair count; the self-join "
    "runs on the prefix hash so only fingerprint groups join",
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup planning needs provenance, not just counts: a mirror pair
    of sources argues for source-level dedup ordering (keep the
    canonical source) rather than doc-level coin flips. The fingerprint
    is the first PREFIX_FP_WORDS words (shared openings = boilerplate or
    copy chains); the join key is its hash — |fingerprint groups| rows
    meet, never corpus × corpus."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    fp = F.md5(F.concat_ws(" ", F.slice(words, 1, PREFIX_FP_WORDS)))
    hashed = docs.select("doc_id", "source", fp.alias("th"))
    a = hashed.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"), "th"
    )
    b = hashed.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"), "th"
    )
    pairs = (
        a.join(b, "th")
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("src_a") != F.col("src_b")))
    )
    lo = F.when(F.col("src_a") < F.col("src_b"), F.col("src_a")).otherwise(
        F.col("src_b")
    )
    hi = F.when(F.col("src_a") < F.col("src_b"), F.col("src_b")).otherwise(
        F.col("src_a")
    )
    return (
        pairs.select(lo.alias("source_lo"), hi.alias("source_hi"))
        .groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
        .orderBy(F.col("n_dup_pairs").desc(), "source_lo", "source_hi")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Token-count histogram (log2 buckets)
# ---------------------------------------------------------------------------


@register(
    "token_count_histogram",
    f"""
    WITH toks AS (
      SELECT len({WORDS_SQL.format(text="text")}) AS n_tok FROM documents
    ),
    bucketed AS (
      SELECT CASE WHEN n_tok <= 0 THEN -1
                  ELSE CAST(floor(log2(n_tok)) AS BIGINT) END AS bucket,
             n_tok
      FROM toks
    )
    SELECT bucket,
           CAST(power(2, bucket) AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(min(n_tok) AS BIGINT) AS min_tok,
           CAST(max(n_tok) AS BIGINT) AS max_tok
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
    "Log2-bucket histogram of per-document whitespace-token counts: "
    "docs, total tokens, and min/max per power-of-two bucket — the "
    "length distribution a packing/curriculum design reads first",
)
def token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one aggregate over ≤64 buckets. floor(log2(n)) on
    integer token counts is exact in both engines for n < 2^53 (log2 of
    an exact power of two is exact in IEEE double; between powers the
    floor is unambiguous)."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    toks = docs.select(F.size(words).alias("n_tok"))
    bucket = F.when(F.col("n_tok") <= 0, F.lit(-1)).otherwise(
        F.floor(F.log2("n_tok"))
    ).cast("long")
    return (
        toks.select(bucket.alias("bucket"), "n_tok")
        .groupBy("bucket")
        .agg(
            F.pow(F.lit(2.0), F.col("bucket")).cast("long").alias("bucket_lo"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("n_tok").cast("long").alias("min_tok"),
            F.max("n_tok").cast("long").alias("max_tok"),
        )
        .select(
            "bucket", "bucket_lo", "n_docs", "total_tokens", "min_tok", "max_tok"
        )
        .orderBy("bucket")
    )


# Curation-funnel gate order and thresholds. The funnel is the table
# every data-curation paper reports: docs/tokens surviving each ORDERED
# gate, per source. Bands are tuned to this corpus' signal so every
# gate has real attrition (mwl p10-p90 ≈ [4.25M, 4.77M] micro-chars;
# uniq-ratio median ≈ 0.46).
FUNNEL_MIN_WORDS = 30
FUNNEL_MWL_LO = 4_300_000
FUNNEL_MWL_HI = 4_700_000
FUNNEL_UNIQ_MIN = 400_000  # distinct-word ratio, micro-units


@register(
    "curation_funnel_attrition",
    f"""
    WITH split AS (
      SELECT source, {WORDS_SQL.format(text="text")} AS w FROM documents
    ),
    per_doc AS (
      SELECT source, len(w) AS n_words,
             list_contains(w, 'the') AND list_contains(w, 'a') AS has_stop,
             CASE WHEN len(w) = 0 THEN 0 ELSE
               CAST((1000000 * list_sum(list_transform(w, x -> length(x))))
                    // len(w) AS BIGINT) END AS mwl,
             CASE WHEN len(w) = 0 THEN 0 ELSE
               CAST((1000000 * len(list_distinct(w))) // len(w) AS BIGINT)
             END AS uq
      FROM split
    ),
    flags AS (
      SELECT source, n_words,
             CASE WHEN n_words >= {FUNNEL_MIN_WORDS} THEN 1 ELSE 0 END AS c1
      FROM per_doc
    ),
    cum AS (
      SELECT f.source, f.n_words, f.c1,
             f.c1 * (CASE WHEN p.has_stop THEN 1 ELSE 0 END) AS c2,
             f.c1 * (CASE WHEN p.has_stop THEN 1 ELSE 0 END)
                  * (CASE WHEN p.mwl BETWEEN {FUNNEL_MWL_LO} AND {FUNNEL_MWL_HI}
                          THEN 1 ELSE 0 END) AS c3,
             f.c1 * (CASE WHEN p.has_stop THEN 1 ELSE 0 END)
                  * (CASE WHEN p.mwl BETWEEN {FUNNEL_MWL_LO} AND {FUNNEL_MWL_HI}
                          THEN 1 ELSE 0 END)
                  * (CASE WHEN p.uq >= {FUNNEL_UNIQ_MIN} THEN 1 ELSE 0 END) AS c4
      FROM flags f POSITIONAL JOIN per_doc p
    ),
    agged AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS d0,
             CAST(sum(n_words) AS BIGINT) AS t0,
             CAST(sum(c1) AS BIGINT) AS d1, CAST(sum(c1 * n_words) AS BIGINT) AS t1,
             CAST(sum(c2) AS BIGINT) AS d2, CAST(sum(c2 * n_words) AS BIGINT) AS t2,
             CAST(sum(c3) AS BIGINT) AS d3, CAST(sum(c3 * n_words) AS BIGINT) AS t3,
             CAST(sum(c4) AS BIGINT) AS d4, CAST(sum(c4 * n_words) AS BIGINT) AS t4
      FROM cum GROUP BY source
    )
    SELECT source, gate_idx, gate, docs_in, docs_out, tokens_in, tokens_out
    FROM (
      SELECT source, 1 AS gate_idx, 'min_words' AS gate,
             d0 AS docs_in, d1 AS docs_out, t0 AS tokens_in, t1 AS tokens_out FROM agged
      UNION ALL
      SELECT source, 2, 'stopwords', d1, d2, t1, t2 FROM agged
      UNION ALL
      SELECT source, 3, 'word_len', d2, d3, t2, t3 FROM agged
      UNION ALL
      SELECT source, 4, 'uniq_ratio', d3, d4, t3, t4 FROM agged
    ) ORDER BY source, gate_idx
    """,
    "Curation funnel: the ORDERED gate composition (min-words → "
    "stopword glue → mean-word-length band → distinct-word ratio) with "
    "per-gate attrition accounting — docs and tokens entering/surviving "
    "each gate, per source — computed in ONE scan (cumulative survival "
    "flags + one hash aggregate; no per-gate re-reads)",
)
def curation_funnel_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel table every curation paper reports, Spark-first: the
    per-doc gate flags are codegen expressions over one scan; cumulative
    survival (c_k = c_{k-1} AND gate_k) makes ordering explicit; ONE
    map-side-combined aggregate keyed by source produces every stage's
    doc/token counts; the 4-stage long form is a zero-shuffle ``stack``
    over the |sources|-row aggregate. 100 TB: linear scan, state =
    |sources| × 10 longs — no join, no window, no second read.

    Oracle note: the DuckDB twin reuses the identical integer-micro
    ratio convention (``//``) as the other curation queries so gate
    boundaries are exact in both engines; the POSITIONAL JOIN is just
    CTE plumbing (same row order by construction), not a real join."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_words = F.size(words)
    agg_len = (
        "aggregate(split(trim(lower(text)), '\\\\s+'), 0L, (acc, x) -> acc + length(x))"
    )
    n_distinct = "size(array_distinct(split(trim(lower(text)), '\\\\s+')))"
    per_doc = docs.select(
        "source",
        n_words.alias("n_words"),
        (F.array_contains(words, "the") & F.array_contains(words, "a")).alias("has_stop"),
        F.expr(
            f"CASE WHEN size(split(trim(lower(text)), '\\\\s+')) = 0 THEN 0L "
            f"ELSE CAST((1000000 * {agg_len}) "
            f"DIV size(split(trim(lower(text)), '\\\\s+')) AS BIGINT) END"
        ).alias("mwl"),
        F.expr(
            f"CASE WHEN size(split(trim(lower(text)), '\\\\s+')) = 0 THEN 0L "
            f"ELSE CAST((1000000 * {n_distinct}) "
            f"DIV size(split(trim(lower(text)), '\\\\s+')) AS BIGINT) END"
        ).alias("uq"),
    )
    c1 = F.when(F.col("n_words") >= FUNNEL_MIN_WORDS, 1).otherwise(0)
    f2 = F.when(F.col("has_stop"), 1).otherwise(0)
    f3 = F.when(F.col("mwl").between(FUNNEL_MWL_LO, FUNNEL_MWL_HI), 1).otherwise(0)
    f4 = F.when(F.col("uq") >= FUNNEL_UNIQ_MIN, 1).otherwise(0)
    cum = per_doc.select(
        "source",
        "n_words",
        c1.alias("c1"),
        (c1 * f2).alias("c2"),
        (c1 * f2 * f3).alias("c3"),
        (c1 * f2 * f3 * f4).alias("c4"),
    )
    agged = cum.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.sum("n_words").cast("long").alias("t0"),
        *[
            e
            for k in (1, 2, 3, 4)
            for e in (
                F.sum(f"c{k}").cast("long").alias(f"d{k}"),
                F.sum(F.col(f"c{k}") * F.col("n_words")).cast("long").alias(f"t{k}"),
            )
        ],
    )
    return agged.selectExpr(
        "source",
        "stack(4, "
        "1, 'min_words',  d0, d1, t0, t1, "
        "2, 'stopwords',  d1, d2, t1, t2, "
        "3, 'word_len',   d2, d3, t2, t3, "
        "4, 'uniq_ratio', d3, d4, t3, t4"
        ") AS (gate_idx, gate, docs_in, docs_out, tokens_in, tokens_out)",
    ).orderBy("source", "gate_idx")


@register(
    "gate_ablation_matrix",
    f"""
    WITH split AS (
      SELECT source, {WORDS_SQL.format(text="text")} AS w FROM documents
    ),
    per_doc AS (
      SELECT source, len(w) AS n_words,
             list_contains(w, 'the') AND list_contains(w, 'a') AS has_stop,
             CASE WHEN len(w) = 0 THEN 0 ELSE
               CAST((1000000 * list_sum(list_transform(w, x -> length(x))))
                    // len(w) AS BIGINT) END AS mwl,
             CASE WHEN len(w) = 0 THEN 0 ELSE
               CAST((1000000 * len(list_distinct(w))) // len(w) AS BIGINT)
             END AS uq
      FROM split
    ),
    flags AS (
      SELECT source, n_words,
             CASE WHEN n_words >= {FUNNEL_MIN_WORDS} THEN 1 ELSE 0 END AS f1,
             CASE WHEN has_stop THEN 1 ELSE 0 END AS f2,
             CASE WHEN mwl BETWEEN {FUNNEL_MWL_LO} AND {FUNNEL_MWL_HI}
                  THEN 1 ELSE 0 END AS f3,
             CASE WHEN uq >= {FUNNEL_UNIQ_MIN} THEN 1 ELSE 0 END AS f4
      FROM per_doc
    ),
    agged AS (
      SELECT source,
             CAST(sum(f1*f2*f3*f4) AS BIGINT) AS d_all,
             CAST(sum(f1*f2*f3*f4*n_words) AS BIGINT) AS t_all,
             CAST(sum(f2*f3*f4) AS BIGINT) AS d_wo1, CAST(sum(f2*f3*f4*n_words) AS BIGINT) AS t_wo1,
             CAST(sum(f1*f3*f4) AS BIGINT) AS d_wo2, CAST(sum(f1*f3*f4*n_words) AS BIGINT) AS t_wo2,
             CAST(sum(f1*f2*f4) AS BIGINT) AS d_wo3, CAST(sum(f1*f2*f4*n_words) AS BIGINT) AS t_wo3,
             CAST(sum(f1*f2*f3) AS BIGINT) AS d_wo4, CAST(sum(f1*f2*f3*n_words) AS BIGINT) AS t_wo4
      FROM flags GROUP BY source
    )
    SELECT source, gate_idx, gate, docs_without, docs_all,
           docs_without - docs_all AS docs_unique_loss,
           tokens_without, tokens_all,
           tokens_without - tokens_all AS tokens_unique_loss
    FROM (
      SELECT source, 1 AS gate_idx, 'min_words' AS gate,
             d_wo1 AS docs_without, d_all AS docs_all,
             t_wo1 AS tokens_without, t_all AS tokens_all FROM agged
      UNION ALL SELECT source, 2, 'stopwords', d_wo2, d_all, t_wo2, t_all FROM agged
      UNION ALL SELECT source, 3, 'word_len', d_wo3, d_all, t_wo3, t_all FROM agged
      UNION ALL SELECT source, 4, 'uniq_ratio', d_wo4, d_all, t_wo4, t_all FROM agged
    ) ORDER BY source, gate_idx
    """,
    "Leave-one-out gate ablation: for each curation gate, the docs and "
    "tokens that survive all OTHER gates (and the marginal loss uniquely "
    "attributable to it) per source — the attribution table that decides "
    "which gate to retune — in ONE scan + one aggregate, order-free "
    "(complements curation_funnel_attrition's ordered view)",
)
def gate_ablation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same single-scan discipline as the funnel: all four leave-one-out
    products plus the all-gates product are codegen integer flags summed
    in ONE map-side-combined aggregate keyed by source; the long form is
    a zero-shuffle stack over the |sources|-row aggregate."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    agg_len = (
        "aggregate(split(trim(lower(text)), '\\\\s+'), 0L, (acc, x) -> acc + length(x))"
    )
    n_distinct = "size(array_distinct(split(trim(lower(text)), '\\\\s+')))"
    sz = "size(split(trim(lower(text)), '\\\\s+'))"
    per_doc = docs.select(
        "source",
        F.size(words).alias("n_words"),
        (F.array_contains(words, "the") & F.array_contains(words, "a")).alias("has_stop"),
        F.expr(
            f"CASE WHEN {sz} = 0 THEN 0L ELSE "
            f"CAST((1000000 * {agg_len}) DIV {sz} AS BIGINT) END"
        ).alias("mwl"),
        F.expr(
            f"CASE WHEN {sz} = 0 THEN 0L ELSE "
            f"CAST((1000000 * {n_distinct}) DIV {sz} AS BIGINT) END"
        ).alias("uq"),
    )
    flags = per_doc.select(
        "source",
        "n_words",
        F.when(F.col("n_words") >= FUNNEL_MIN_WORDS, 1).otherwise(0).alias("f1"),
        F.when(F.col("has_stop"), 1).otherwise(0).alias("f2"),
        F.when(
            F.col("mwl").between(FUNNEL_MWL_LO, FUNNEL_MWL_HI), 1
        ).otherwise(0).alias("f3"),
        F.when(F.col("uq") >= FUNNEL_UNIQ_MIN, 1).otherwise(0).alias("f4"),
    )
    combos = {"all": ("f1", "f2", "f3", "f4"), "wo1": ("f2", "f3", "f4"),
              "wo2": ("f1", "f3", "f4"), "wo3": ("f1", "f2", "f4"),
              "wo4": ("f1", "f2", "f3")}

    def prod(fs):
        e = F.col(fs[0])
        for f in fs[1:]:
            e = e * F.col(f)
        return e

    agged = flags.groupBy("source").agg(
        *[
            e
            for k, fs in combos.items()
            for e in (
                F.sum(prod(fs)).cast("long").alias(f"d_{k}"),
                F.sum(prod(fs) * F.col("n_words")).cast("long").alias(f"t_{k}"),
            )
        ]
    )
    return agged.selectExpr(
        "source",
        "stack(4, "
        "1, 'min_words',  d_wo1, d_all, d_wo1 - d_all, t_wo1, t_all, t_wo1 - t_all, "
        "2, 'stopwords',  d_wo2, d_all, d_wo2 - d_all, t_wo2, t_all, t_wo2 - t_all, "
        "3, 'word_len',   d_wo3, d_all, d_wo3 - d_all, t_wo3, t_all, t_wo3 - t_all, "
        "4, 'uniq_ratio', d_wo4, d_all, d_wo4 - d_all, t_wo4, t_all, t_wo4 - t_all"
        ") AS (gate_idx, gate, docs_without, docs_all, docs_unique_loss, "
        "tokens_without, tokens_all, tokens_unique_loss)",
    ).orderBy("source", "gate_idx")


# ---------------------------------------------------------------------------
# Fixed-window document chunking (sequence prep / RAG chunking)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 48
CHUNK_STRIDE = 40  # = CHUNK_TOKENS - 8 tokens of overlap


@register(
    "doc_chunking_windows",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, len(ts) AS n_tok,
             unnest(generate_series(
               0, CAST(ceil(CAST(len(ts) AS DOUBLE) / {CHUNK_STRIDE}) AS INT) - 1
             )) AS chunk_ix,
             ts
      FROM d WHERE len(ts) > 0
    )
    SELECT doc_id, lang, CAST(chunk_ix AS INT) AS chunk_ix,
           CAST(len(ts[chunk_ix * {CHUNK_STRIDE} + 1 :
                      chunk_ix * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS INT)
             AS chunk_len,
           md5(array_to_string(
               ts[chunk_ix * {CHUNK_STRIDE} + 1 :
                  chunk_ix * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
             AS chunk_md5
    FROM c
    WHERE chunk_ix * {CHUNK_STRIDE} < n_tok
    """,
    f"Fixed-window document chunking ({CHUNK_TOKENS}-token windows, "
    f"{CHUNK_TOKENS - CHUNK_STRIDE}-token overlap): the sequence-prep / "
    "RAG-chunking step — every doc explodes into strided windows with a "
    "content fingerprint per chunk (md5 over the joined window), so "
    "chunk-level dedup and retrieval indexing can join on it. Pure "
    "codegen: tokenize once, one posexplode, per-chunk slices; no "
    "shuffle at all until a consumer aggregates.",
)
def doc_chunking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = docs.select("doc_id", "lang", ts.alias("ts")).filter(F.size("ts") > 0)
    n_chunks = F.ceil(F.size("ts").cast("double") / F.lit(CHUNK_STRIDE)).cast("int")
    c = d.select(
        "doc_id",
        "lang",
        F.size("ts").alias("n_tok"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "chunk_ix"),
        "ts",
    ).filter(F.col("chunk_ix") * CHUNK_STRIDE < F.col("n_tok"))
    window = F.slice(
        F.col("ts"), F.col("chunk_ix") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return c.select(
        "doc_id",
        "lang",
        F.col("chunk_ix").cast("int").alias("chunk_ix"),
        F.size(window).cast("int").alias("chunk_len"),
        F.md5(F.array_join(window, " ")).alias("chunk_md5"),
    )
