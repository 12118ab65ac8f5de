"""Corpus-statistics pipeline queries, round 5 (second wave): unigram
language-model quality scoring, TF-IDF top terms, incremental dedup of a
new batch against an existing corpus, and an inverted-index posting
build.

These cover the "model-based quality filtering + index + incremental
ingest" slice of a training-data pipeline (reference scope: the
connector ingests; the filtering/indexing layer is the beyond-parity
surface SURVEY §6 claims).

Determinism contract (same as plans/queries.py): every natural log is
integerized per ROW as ``CAST-safe ROUND(ln(x)*1e6)`` micro-nats BEFORE
any aggregation, so all sums/comparisons are integer-exact and
order-insensitive; the only floats in any output are final ratios
rounded to 6 decimals. Spark-side casts go through ``ROUND(x, 0)``
first (integral double) because Spark's double→long cast truncates
while DuckDB's rounds — rounding first makes both exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import h60_col, h60_sql
from ..operators.similarity import ivf_assign_sql, with_ivf_cell
from .queries import _t, register
from ..lake.relation_cache import local_rows_df

TOKEN_SPLIT = r"\s+"
LOGPROB_LOW_MICRO = -3_600_000  # avg ln p < -3.6 → rare-token-heavy doc
TFIDF_TOP_K = 3
POSTINGS_TOP_TERMS = 20
POSTINGS_SAMPLE = 5
INCOMING_MOD = 5  # doc_id % 5 == 4 → the "new batch"


def _micronats_sql(expr: str) -> str:
    return f"CAST(ROUND(ln({expr}) * 1000000) AS BIGINT)"


def _micronats_col(c) -> F.Column:
    # ROUND(x, 0) yields an integral double on both engines; Spark's
    # long cast then truncates exactly, DuckDB's rounds exactly — equal.
    return F.round(F.log(c) * 1000000.0, 0).cast("long")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    n_part = spark.sparkContext.defaultParallelism
    return docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.explode(words).alias("w")
    )


@register(
    "unigram_logprob_quality",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    corpus AS (
      SELECT {_micronats_sql('CAST(sum(n) AS DOUBLE)')} AS ln_total_micro
      FROM freq
    ),
    per_doc AS (
      SELECT t.doc_id, t.lang, count(*) AS n_tok,
             CAST(sum({_micronats_sql('CAST(f.n AS DOUBLE)')}) AS BIGINT)
               AS sum_ln_micro
      FROM tok t JOIN freq f ON t.w = f.w
      GROUP BY t.doc_id, t.lang
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(floor(CAST(sum_ln_micro AS DOUBLE) / n_tok) AS BIGINT)
               - (SELECT ln_total_micro FROM corpus) AS score_micro
      FROM per_doc
    )
    SELECT lang, count(*) AS n_docs,
           ROUND(avg(CAST(score_micro AS DOUBLE)) / 1000000, 6)
             AS avg_logprob,
           CAST(sum(CASE WHEN score_micro < {LOGPROB_LOW_MICRO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
    FROM scored GROUP BY lang
    """,
    "Unigram LM quality scoring: corpus token frequencies → per-doc mean "
    "log-probability (micro-nat integers, exact cross-engine) → per-lang "
    "average + low-quality count. The KenLM-style 'perplexity filter' "
    "stage of a training-data pipeline, as two shuffles: one vocab-sized "
    "frequency agg, one per-doc rollup",
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass 1 builds the unigram model (groupBy token — vocab-sized, fully
    map-side combined); pass 2 joins each token to its corpus frequency
    and rolls up per doc. The model total enters as a broadcast 1-row
    cross join — at 100 TB the vocab agg output is still tiny relative
    to the corpus, and the token→freq join shuffles tokens once on ``w``
    (AQE handles stopword skew; see skewed_event_stats_salted for the
    explicit-salt variant). Scores are integer micro-nats end-to-end."""
    tok = _tokens(spark, sf_dir)
    tok.persist()
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    corpus = freq.agg(
        _micronats_col(F.sum("n").cast("double")).alias("ln_total_micro")
    )
    per_doc = (
        tok.join(freq, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(_micronats_col(F.col("n").cast("double"))).alias("sum_ln_micro"),
        )
    )
    scored = per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "lang",
        (
            F.floor(F.col("sum_ln_micro").cast("double") / F.col("n_tok")).cast("long")
            - F.col("ln_total_micro")
        ).alias("score_micro"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("score_micro").cast("double")) / 1000000.0, 6).alias(
            "avg_logprob"
        ),
        F.sum(
            F.when(F.col("score_micro") < LOGPROB_LOW_MICRO, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_low_quality"),
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}')) AS w
      FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w AS term, tf.tf,
             tf.tf * {_micronats_sql(
                 'CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df'
             )} AS score_micro
      FROM tf JOIN df ON tf.w = df.w
    ),
    ranked AS (
      SELECT doc_id, term, tf, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, rank, term, tf,
           ROUND(CAST(score_micro AS DOUBLE) / 1000000, 6) AS tfidf
    FROM ranked WHERE rank <= {TFIDF_TOP_K}
    """,
    f"TF-IDF top-{TFIDF_TOP_K} terms per document: term frequency × "
    "integer micro-nat idf (exact ranking, term tie-break) — the "
    "keyword-extraction stage used for topic tagging / mixture labeling",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf is one groupBy over exploded tokens (map-side combined on
    (doc_id, w)); df reduces tf — vocab-sized — and comes back as a
    broadcast join, so the corpus shuffles once. The doc-count scalar is
    a broadcast 1-row cross join. Scoring is BIGINT (tf × micro-idf):
    rank ties cannot drift across engines."""
    tok = _tokens(spark, sf_dir).drop("lang")
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    tf.persist()
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = _t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            "tf",
            (
                F.col("tf")
                * _micronats_col(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("score_micro"),
        )
    )
    win = W.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "rank",
            "term",
            "tf",
            F.round(F.col("score_micro").cast("double") / 1000000.0, 6).alias(
                "tfidf"
            ),
        )
    )


# ---------------------------------------------------------------------------
# N-gram novelty decay across ingestion waves
# ---------------------------------------------------------------------------

NOVELTY_WAVES = 10
NOVELTY_N = 3  # trigrams


@register(
    "ngram_novelty_curve",
    f"""
    WITH w AS (
      SELECT doc_id % {NOVELTY_WAVES} AS wave,
             string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}') AS ws
      FROM documents
    ),
    tri AS (
      SELECT wave,
             unnest(list_transform(generate_series(1, len(ws) - {NOVELTY_N - 1}),
                    i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS g
      FROM w WHERE len(ws) >= {NOVELTY_N}
    ),
    per_wave AS (
      SELECT wave, g, count(*) AS n FROM tri GROUP BY wave, g
    ),
    first_seen AS (SELECT g, min(wave) AS first_wave FROM per_wave GROUP BY g)
    SELECT p.wave,
           CAST(sum(p.n) AS BIGINT) AS n_ngrams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN f.first_wave = p.wave THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(sum(CASE WHEN f.first_wave = p.wave THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS novelty_rate
    FROM per_wave p JOIN first_seen f ON p.g = f.g
    GROUP BY p.wave ORDER BY p.wave
    """,
    f"Trigram novelty decay across {NOVELTY_WAVES} ingestion waves: the "
    "fraction of each wave's distinct n-grams never seen in an earlier "
    "wave — the 'is more data still adding information' curve used to "
    "decide when a crawl source is mined out",
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigrams come from one higher-order transform per document (no
    per-token explode-then-window); novelty is a self-aggregation —
    distinct (wave, gram) counts, then min-wave per gram joined back.
    Two shuffles, both on the gram key, both map-side combined; gram
    cardinality (not corpus size) bounds the join, and the min-wave
    frame is exactly the incremental-dedup corpus index shape."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    w = docs.select(
        (F.col("doc_id") % NOVELTY_WAVES).alias("wave"), ws.alias("ws")
    ).filter(F.size("ws") >= NOVELTY_N)
    tri = w.select(
        "wave",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - (NOVELTY_N - 1)),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("ws", i),
                    F.element_at("ws", i + 1),
                    F.element_at("ws", i + 2),
                ),
            )
        ).alias("g"),
    )
    per_wave = tri.groupBy("wave", "g").agg(F.count(F.lit(1)).alias("n"))
    per_wave.persist()
    first_seen = per_wave.groupBy("g").agg(F.min("wave").alias("first_wave"))
    novel = F.when(F.col("first_wave") == F.col("wave"), 1).otherwise(0)
    return (
        per_wave.join(first_seen, "g")
        .groupBy("wave")
        .agg(
            F.sum("n").alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty_rate"),
        )
        .orderBy("wave")
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counting (first iteration of BPE vocab training)
# ---------------------------------------------------------------------------

BPE_TOP_K = 5


@register(
    "bpe_pair_counts",
    f"""
    WITH tok AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT lang,
             unnest(list_transform(generate_series(1, length(w) - 1),
                                   i -> substring(w, i, 2))) AS pair
      FROM tok WHERE length(w) >= 2
    ),
    cnt AS (SELECT lang, pair, count(*) AS n FROM pairs GROUP BY lang, pair),
    ranked AS (
      SELECT lang, pair, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, pair ASC) AS rank
      FROM cnt
    )
    SELECT lang, rank, pair, n FROM ranked WHERE rank <= {BPE_TOP_K}
    """,
    f"BPE merge-candidate counting: adjacent character-pair frequencies "
    f"per language, top-{BPE_TOP_K} with a total (count, pair) order — "
    "the first iteration of BPE tokenizer training, distributed (the "
    "merge loop repeats this count on re-segmented words)",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character pairs via a higher-order transform over an index
    sequence (no Python, no explode-per-character): each word of length
    L emits its L-1 adjacent pairs in one codegen'd expression, then one
    (lang, pair)-keyed count — alphabet²-sized state, fully map-side
    combined, linear in corpus bytes at any scale. The guard
    ``length(w) >= 2`` matters cross-engine: Spark's sequence(1, 0)
    DESCENDS while DuckDB's generate_series(1, 0) is empty."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    tok = docs.select("lang", F.explode(words).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = tok.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    cnt = pairs.groupBy("lang", "pair").agg(F.count(F.lit(1)).alias("n"))
    win = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        cnt.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= BPE_TOP_K)
        .select("lang", "rank", "pair", "n")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Okapi k1=1.2, b=0.75)
# ---------------------------------------------------------------------------

BM25_TERMS = ["table", "merge", "window", "scan"]
BM25_TOP_K = 10
_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)

# CTE block ending in ``scored`` (doc_id, lang, matched_terms,
# score_micro) — shared by the BM25 top-k oracle and the hybrid
# RRF-fusion oracle in plans/eval_ops.py.
_BM25_SCORED_CTES = f"""tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, lang, count(*) AS dl FROM tok GROUP BY doc_id, lang),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, w, count(*) AS tf FROM tok
      WHERE w IN ({_BM25_IN}) GROUP BY doc_id, w
    ),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    contrib AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((CAST(s.n_docs AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE))
                  / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
               * (tf.tf * CAST(2.2 AS DOUBLE))
               / (tf.tf + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * d.dl / s.avgdl))
               * 1000000) AS BIGINT) AS c_micro
      FROM tf JOIN df ON tf.w = df.w JOIN dl d ON tf.doc_id = d.doc_id, stats s
    ),
    scored AS (
      SELECT c.doc_id, d.lang,
             CAST(count(*) AS BIGINT) AS matched_terms,
             CAST(sum(c.c_micro) AS BIGINT) AS score_micro
      FROM contrib c JOIN dl d ON c.doc_id = d.doc_id
      GROUP BY c.doc_id, d.lang
    )"""


@register(
    "bm25_retrieval_topk",
    f"""
    WITH {_BM25_SCORED_CTES}
    SELECT doc_id, lang, matched_terms, score_micro,
           ROUND(CAST(score_micro AS DOUBLE) / 1000000, 6) AS score
    FROM scored ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOP_K}
    """,
    f"Okapi BM25 top-{BM25_TOP_K} retrieval over the corpus for a fixed "
    f"term set {BM25_TERMS} (k1=1.2, b=0.75) — the dense-free retrieval "
    "baseline of a RAG / eval-harness pipeline; per-(doc,term) "
    "contributions integerize to micro-nats BEFORE the sum, so ranking "
    "is integer-exact and tie-break is total (score, doc_id)",
)
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus shuffle (tokens → per-doc tf over the FILTERED term
    set); doc lengths reduce from the same token frame; df and the
    (n_docs, avgdl) scalars come back as broadcasts — at 100 TB the
    probe side stays corpus-linear with vocab-tiny build sides, the
    same shape as contamination_overlap. The BM25 kernel is one codegen
    expression per (doc, term) row, rounded to integer micro-nats
    before the per-doc sum so cross-engine ranking cannot drift."""
    scored = bm25_scored(spark, sf_dir)
    return (
        scored.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(BM25_TOP_K)
        .select(
            "doc_id",
            "lang",
            "matched_terms",
            "score_micro",
            F.round(F.col("score_micro").cast("double") / 1000000.0, 6).alias(
                "score"
            ),
        )
    )


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 ``scored`` frame (doc_id, lang, matched_terms,
    score_micro) — Spark twin of ``_BM25_SCORED_CTES``; shared with the
    hybrid RRF-fusion query."""
    tok = _tokens(spark, sf_dir)
    tok.persist()
    dl = tok.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("dl"))
    dl.persist()
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("w").isin(BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfnorm = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(df), "w")
        .join(dl.drop("lang"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tfnorm * 1000000.0, 0).cast("long").alias("c_micro"),
        )
    )
    scored = (
        contrib.join(dl.select("doc_id", "lang"), "doc_id")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.sum("c_micro").alias("score_micro"),
        )
    )
    return scored


@register(
    "incremental_dedup_new_batch",
    f"""
    WITH d AS (
      SELECT doc_id, lang, {h60_sql('text')} AS h FROM documents
    ),
    corpus AS (SELECT DISTINCT h FROM d WHERE doc_id % {INCOMING_MOD} != {INCOMING_MOD - 1}),
    batch AS (
      SELECT doc_id, lang, h FROM d
      WHERE doc_id % {INCOMING_MOD} = {INCOMING_MOD - 1}
      UNION ALL
      SELECT doc_id + 1000000, lang, h FROM d WHERE doc_id % 25 = 3
      UNION ALL
      SELECT doc_id + 2000000, lang, h FROM d
      WHERE doc_id % {INCOMING_MOD} = {INCOMING_MOD - 1} AND doc_id % 25 = 9
    ),
    inc AS (
      SELECT b.doc_id, b.lang, b.h,
             b.h IN (SELECT h FROM corpus) AS dupc
      FROM batch b
    ),
    fresh AS (
      SELECT lang,
             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM inc WHERE NOT dupc
    ),
    a1 AS (
      SELECT lang, count(*) AS n_incoming,
             CAST(sum(CASE WHEN dupc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_corpus
      FROM inc GROUP BY lang
    ),
    a2 AS (
      SELECT lang,
             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_batch,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_accepted
      FROM fresh GROUP BY lang
    )
    SELECT a1.lang, n_incoming, n_dup_corpus,
           COALESCE(n_dup_batch, 0) AS n_dup_batch,
           COALESCE(n_accepted, 0) AS n_accepted
    FROM a1 LEFT JOIN a2 ON a1.lang = a2.lang
    """,
    "Incremental ingest dedup: a new batch (the 20% doc slice plus a "
    "simulated re-crawl of corpus docs under fresh ids and an in-batch "
    "double) checked against the standing corpus by content hash "
    "(anti-join), then deduped within itself keep-first — per-lang "
    "accounting of incoming/corpus-dup/batch-dup/accepted. The "
    "'continuous crawl ingestion' path: only batch-sized state shuffles",
)
def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus side reduces to DISTINCT h before the join, so the
    probe is hash-join on 60-bit content hashes — at 100 TB the hash set
    is ~1% of corpus bytes and the incoming batch is small; Spark picks
    shuffle-hash or broadcast by size via AQE. The within-batch
    keep-first window partitions by h (batch-sized state only). The
    re-crawl slice (doc_id%25==3 → new id) collides with the corpus;
    the doubled slice (%25==9) collides only within the batch — both
    accounting branches run on real collisions."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang", h60_col(F.col("text")).alias("h"))
    is_inc = F.col("doc_id") % INCOMING_MOD == INCOMING_MOD - 1
    corpus = d.filter(~is_inc).select("h").distinct()
    batch = (
        d.filter(is_inc)
        .unionAll(
            d.filter(F.col("doc_id") % 25 == 3).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "lang", "h"
            )
        )
        .unionAll(
            d.filter(is_inc & (F.col("doc_id") % 25 == 9)).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "lang", "h"
            )
        )
    )
    inc = (
        batch.join(corpus.withColumn("dupc_m", F.lit(True)), "h", "left")
        .select(
            "doc_id", "lang", "h", F.coalesce("dupc_m", F.lit(False)).alias("dupc")
        )
    )
    inc.persist()
    a1 = inc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(F.when(F.col("dupc"), 1).otherwise(0)).cast("long").alias(
            "n_dup_corpus"
        ),
    )
    rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    fresh = inc.filter(~F.col("dupc")).select("lang", rn.alias("rn"))
    a2 = fresh.groupBy("lang").agg(
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias(
            "n_dup_batch"
        ),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias(
            "n_accepted"
        ),
    )
    return a1.join(a2, "lang", "left").select(
        "lang",
        "n_incoming",
        "n_dup_corpus",
        F.coalesce("n_dup_batch", F.lit(0)).alias("n_dup_batch"),
        F.coalesce("n_accepted", F.lit(0)).alias("n_accepted"),
    )


@register(
    "inverted_index_postings",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}')) AS w
      FROM documents
    ),
    df AS (SELECT w AS term, count(*) AS df FROM tok GROUP BY w),
    top AS (
      SELECT term, df FROM (
        SELECT term, df,
               row_number() OVER (ORDER BY df DESC, term ASC) AS rn
        FROM df
      ) r WHERE rn <= {POSTINGS_TOP_TERMS}
    ),
    sampled AS (
      SELECT t.w AS term, t.doc_id FROM (
        SELECT w, doc_id,
               row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rn
        FROM tok WHERE w IN (SELECT term FROM top)
      ) t WHERE t.rn <= {POSTINGS_SAMPLE}
    )
    SELECT top.term, top.df,
           (SELECT string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
            FROM sampled WHERE sampled.term = top.term) AS sample_docs
    FROM top
    """,
    f"Inverted-index build: distinct (term, doc) postings → document "
    f"frequency → top-{POSTINGS_TOP_TERMS} terms with their first "
    f"{POSTINGS_SAMPLE} posting entries — the retrieval-index side of a "
    "contamination / search tool over the corpus",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings are DISTINCT (w, doc_id) — one shuffle; df reduces that.
    Top-k terms use takeOrdered semantics (orderBy + limit → Spark
    TakeOrderedAndProject, no global sort materialization); the sample
    postings window only runs on the top-k semi-joined slice, so the
    per-term window state is bounded by the term cap, not corpus size."""
    tok = _tokens(spark, sf_dir).drop("lang").distinct()
    tok.persist()
    df = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    top = (
        df.orderBy(F.col("df").desc(), F.col("w").asc())
        .limit(POSTINGS_TOP_TERMS)
        .select(F.col("w").alias("term"), "df")
    )
    slice_ = tok.join(
        F.broadcast(top), tok.w == F.col("term"), "inner"
    ).select("term", "df", "doc_id")
    rn = F.row_number().over(W.partitionBy("term").orderBy("doc_id"))
    return (
        slice_.withColumn("rn", rn)
        .filter(F.col("rn") <= POSTINGS_SAMPLE)
        .groupBy("term", "df")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias(
                "sample_docs"
            )
        )
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog distinct sketch (grouped)
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
# alpha_m * m^2 for m=256 (Flajolet et al. 2007) — the SAME Python float
# literal is embedded in the Spark plan and the oracle SQL, so both
# engines start from an identical double.
HLL_ALPHA_M2 = repr((0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M)
HLL_2P53 = 1 << 53  # register scale: sum(2^(53-rho)) stays integer-exact


@register(
    "hll_distinct_sketch",
    f"""
    WITH h AS (
      SELECT event_type,
             {h60_sql('CAST(user_id AS VARCHAR)')} AS hv
      FROM events
    ),
    split AS (
      SELECT event_type, hv % {HLL_M} AS idx, hv >> {HLL_P} AS w FROM h
    ),
    reg AS (
      SELECT event_type, idx,
             max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS r
      FROM split GROUP BY event_type, idx
    ),
    sk AS (
      SELECT event_type,
             CAST(sum(1::BIGINT << (53 - r)) AS BIGINT)
               + ({HLL_M} - count(*)) * {HLL_2P53}::BIGINT AS s,
             {HLL_M} - count(*) AS v
      FROM reg GROUP BY event_type
    ),
    est AS (
      SELECT event_type, v,
             {HLL_ALPHA_M2} / (CAST(s AS DOUBLE) / {HLL_2P53}) AS e_raw
      FROM sk
    ),
    corrected AS (
      SELECT event_type,
             CASE WHEN e_raw <= 2.5 * {HLL_M} AND v > 0
                  THEN {HLL_M} * ln({HLL_M} / CAST(v AS DOUBLE))
                  ELSE e_raw END AS e
      FROM est
    ),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT exact.event_type, n_exact,
           ROUND(e, 4) AS hll_estimate,
           ROUND((e - n_exact) / n_exact * 100, 4) AS rel_err_pct
    FROM exact JOIN corrected ON exact.event_type = corrected.event_type
    """,
    "Deterministic HyperLogLog (p=8) distinct-user sketch per event "
    "type, register maxima from md5-derived 60-bit hashes — integer "
    "register sums make the normally-approximate sketch bit-identical "
    "across engines; reported against the exact distinct count",
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch is ONE map-side-combinable aggregation (register maxima
    over (group, idx) — at most m=256 rows per group survive the map
    side), then a 256-row rollup per group: the mergeable-state shape
    that lets 1000 executors sketch 100 TB with a KB of state per
    group. The exact count here is the verification twin; production
    would drop it. Registers sum as BIGINT 2^(53-rho) terms, so the
    estimate's double arithmetic starts from identical integers in both
    engines; the small-range correction branch compares identical
    doubles."""
    ev = _t(spark, sf_dir, "events")
    hv = h60_col(F.col("user_id").cast("string"))
    split = ev.select(
        "event_type",
        (hv % HLL_M).alias("idx"),
        F.shiftright(hv, HLL_P).alias("w"),
    )
    rho = F.when(F.col("w") == 0, 53).otherwise(
        53 - F.length(F.bin(F.col("w")))
    )
    reg = split.groupBy("event_type", "idx").agg(F.max(rho).alias("r"))
    sk = reg.groupBy("event_type").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(HLL_2P53)
        )
        .cast("long")
        .alias("s"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("v"),
    )
    e_raw = F.lit(float(HLL_ALPHA_M2)) / (
        F.col("s").cast("double") / F.lit(float(HLL_2P53))
    )
    e = F.when(
        (e_raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v").cast("double")),
    ).otherwise(e_raw)
    corrected = sk.select("event_type", e.alias("e"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(F.broadcast(corrected), "event_type").select(
        "event_type",
        "n_exact",
        F.round(F.col("e"), 4).alias("hll_estimate"),
        F.round((F.col("e") - F.col("n_exact")) / F.col("n_exact") * 100, 4).alias(
            "rel_err_pct"
        ),
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation: IVF probe vs exact brute force
# ---------------------------------------------------------------------------

RECALL_QUERY_MOD = 25  # vec_id % 25 == 0 → the sampled query set
RECALL_K = 10


@register(
    "ann_recall_eval",
    None,  # placeholder replaced below (needs centroid literals)
    "",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the ANN family: recall@10 of the IVF cell
    probe against exact brute force, on a deterministic sampled query
    set. Corpus vectors + cell assignments compute ONCE and persist;
    the query set broadcasts into both rankings (corpus never shuffles
    — the two row_number windows partition by query id over the
    broadcast-join product). At 100 TB recall eval always runs on a
    sampled query set exactly like this; the exact ranking is the
    expensive side and is the thing being sampled."""
    from .queries import IVF_CENTROIDS

    emb = _t(spark, sf_dir, "embeddings")
    v = with_ivf_cell(
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ),
        "v",
        [_unit_c(c) for c in IVF_CENTROIDS],
    )
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    v = v.withColumn("nrm", nrm)
    v.persist()
    q = v.filter(F.col("vec_id") % RECALL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("cell").alias("qcell"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    pairs = (
        v.join(F.broadcast(q), v.vec_id != q.qid)
        .select(
            "qid",
            "vec_id",
            "cell",
            "qcell",
            F.round(dot / (F.col("nrm") * F.col("qnrm")), 6).alias("cos"),
        )
    )
    pairs.persist()
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    )
    brute = (
        pairs.withColumn("rn", rn).filter(F.col("rn") <= RECALL_K)
        .select("qid", "vec_id")
    )
    ivf = (
        pairs.filter(F.col("cell") == F.col("qcell"))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= RECALL_K)
        .select("qid", "vec_id")
    )
    hits = brute.join(ivf, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("h")
    )
    perq = q.select("qid").join(hits, "qid", "left").select(
        "qid", F.coalesce("h", F.lit(0)).alias("h")
    )
    return perq.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("h").cast("long").alias("sum_hits"),
        F.round(
            F.sum("h") / (F.lit(float(RECALL_K)) * F.count(F.lit(1))), 6
        ).alias("avg_recall_at_10"),
        F.sum(F.when(F.col("h") == RECALL_K, 1).otherwise(0))
        .cast("long")
        .alias("n_perfect"),
    )


def _unit_c(vec):
    import math

    n = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [round(float(x) / n, 9) for x in vec]


def _ann_recall_oracle() -> str:
    from .queries import IVF_CENTROIDS, QUERIES

    assign = ivf_assign_sql("CAST(embedding AS DOUBLE[])", [_unit_c(c) for c in IVF_CENTROIDS])
    return f"""
    WITH v AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
             {assign} AS cell
      FROM embeddings
    ),
    q AS (
      SELECT id AS qid, v AS qv, cell AS qcell FROM v
      WHERE id % {RECALL_QUERY_MOD} = 0
    ),
    pairs AS (
      SELECT q.qid, v.id, v.cell, q.qcell,
             ROUND(list_cosine_similarity(v.v, q.qv), 6) AS cos
      FROM v, q WHERE v.id <> q.qid
    ),
    brute AS (
      SELECT qid, id FROM (
        SELECT qid, id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, id) AS rn
        FROM pairs
      ) r WHERE rn <= {RECALL_K}
    ),
    ivf AS (
      SELECT qid, id FROM (
        SELECT qid, id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, id) AS rn
        FROM pairs WHERE cell = qcell
      ) r WHERE rn <= {RECALL_K}
    ),
    hits AS (
      SELECT b.qid, count(*) AS h
      FROM brute b JOIN ivf i ON b.qid = i.qid AND b.id = i.id
      GROUP BY b.qid
    ),
    perq AS (
      SELECT q.qid, COALESCE(h, 0) AS h FROM q LEFT JOIN hits USING (qid)
    )
    SELECT count(*) AS n_queries,
           CAST(sum(h) AS BIGINT) AS sum_hits,
           ROUND(sum(h) / ({RECALL_K}.0 * count(*)), 6) AS avg_recall_at_10,
           CAST(sum(CASE WHEN h = {RECALL_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_perfect
    FROM perq
    """


def _finalize_ann_recall() -> None:
    from .queries import QUERIES

    qd = QUERIES["ann_recall_eval"]
    QUERIES["ann_recall_eval"] = type(qd)(
        fn=qd.fn,
        oracle=_ann_recall_oracle(),
        description="ANN evaluation harness: recall@10 of the IVF cell "
        "probe vs exact brute-force cosine ranking over a deterministic "
        "sampled query set — sum-of-hits integers, exact cross-engine",
    )


_finalize_ann_recall()


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD)
# ---------------------------------------------------------------------------

# 3 * 1.4826 (the normal-consistency constant) as an integer cross-
# multiplication: |dev| * 10000 > 44478 * MAD — float-free flagging.
MAD_K_X10000 = 44478


@register(
    "robust_value_outliers",
    f"""
    WITH ev AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
      FROM events
    ),
    n AS (SELECT event_type, count(*) AS n FROM ev GROUP BY event_type),
    r1 AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn
      FROM ev
    ),
    med AS (
      SELECT r1.event_type, r1.c AS median_cents
      FROM r1 JOIN n ON r1.event_type = n.event_type
      WHERE r1.rn = (n.n + 1) // 2
    ),
    dev AS (
      SELECT ev.event_type, abs(ev.c - med.median_cents) AS d
      FROM ev JOIN med ON ev.event_type = med.event_type
    ),
    r2 AS (
      SELECT event_type, d,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM dev
    ),
    mad AS (
      SELECT r2.event_type, r2.d AS mad_cents
      FROM r2 JOIN n ON r2.event_type = n.event_type
      WHERE r2.rn = (n.n + 1) // 2
    )
    SELECT n.event_type, n.n AS n_events,
           med.median_cents, mad.mad_cents,
           (SELECT CAST(sum(CASE WHEN dev.d * 10000 > {MAD_K_X10000} * mad.mad_cents
                         THEN 1 ELSE 0 END) AS BIGINT)
            FROM dev WHERE dev.event_type = n.event_type) AS n_outliers
    FROM n JOIN med ON n.event_type = med.event_type
            JOIN mad ON n.event_type = mad.event_type
    """,
    "Robust outlier detection per event type: lower-median + MAD on "
    "integer cents, outliers flagged by integer cross-multiplication "
    "(3x1.4826 consistency scale) — no float thresholds anywhere",
)
def robust_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics from ONE (event_type, cents) histogram:
    the lower median is the smallest value whose cumulative count
    reaches (n+1)÷2, read off a cumulative window over the histogram;
    the MAD repeats the trick on |c − median| without re-grouping
    (cumulative row frames handle deviation ties correctly). Previously
    two full row_number sorts over all events. The histogram support is
    bounded by the cents domain (~10k values) — corpus-size-INDEPENDENT
    at 100 TB, and mergeable per partition. One SQL statement (same
    Py4J-cost rationale as embedding_outlier_mad)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("rvo_events")
    return spark.sql(f"""
    WITH hist AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c,
             count(1) AS cnt
      FROM rvo_events GROUP BY event_type, 2
    ),
    m1 AS (
      SELECT *,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM hist
    ),
    m2 AS (
      SELECT *,
             min(CASE WHEN cum >= (n + 1) DIV 2 THEN c END)
               OVER (PARTITION BY event_type) AS median_cents
      FROM m1
    ),
    m3 AS (
      SELECT event_type, c, cnt, n, median_cents,
             abs(c - median_cents) AS d,
             sum(cnt) OVER (PARTITION BY event_type
                            ORDER BY abs(c - median_cents)
                            ROWS UNBOUNDED PRECEDING) AS cum2
      FROM m2
    ),
    m4 AS (
      SELECT *,
             min(CASE WHEN cum2 >= (n + 1) DIV 2 THEN d END)
               OVER (PARTITION BY event_type) AS mad_cents
      FROM m3
    )
    SELECT event_type, sum(cnt) AS n_events, median_cents, mad_cents,
           sum(CASE WHEN d * 10000 > {MAD_K_X10000} * mad_cents
                    THEN cnt ELSE CAST(0 AS BIGINT) END) AS n_outliers
    FROM m4
    GROUP BY event_type, median_cents, mad_cents
    """).select("event_type", "n_events", "median_cents", "mad_cents", "n_outliers")


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # counters per row
CMS_TOP = 10


@register(
    "cms_heavy_hitters",
    f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}')) AS w
      FROM documents
    ),
    rows_ AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r),
    cells AS (
      SELECT r, {h60_sql("w || '#' || CAST(r AS VARCHAR)")} % {CMS_W} AS idx,
             count(*) AS c
      FROM tok, rows_ GROUP BY r, idx
    ),
    exact AS (SELECT w, count(*) AS n_exact FROM tok GROUP BY w),
    top AS (
      SELECT w, n_exact FROM (
        SELECT w, n_exact,
               row_number() OVER (ORDER BY n_exact DESC, w ASC) AS rn
        FROM exact
      ) t WHERE rn <= {CMS_TOP}
    ),
    probes AS (
      SELECT top.w, top.n_exact, r.r,
             {h60_sql("top.w || '#' || CAST(r.r AS VARCHAR)")} % {CMS_W} AS idx
      FROM top, rows_ r
    )
    SELECT p.w AS token, p.n_exact,
           CAST(min(c.c) AS BIGINT) AS cms_estimate,
           CAST(min(c.c) - p.n_exact AS BIGINT) AS overestimate
    FROM probes p JOIN cells c ON p.r = c.r AND p.idx = c.idx
    GROUP BY p.w, p.n_exact
    """,
    f"Count-min sketch ({CMS_D}x{CMS_W}) heavy-hitter estimation over "
    "corpus tokens, md5-salted row hashes — integer counters make the "
    "sketch bit-identical across engines; reported with the exact "
    "counts and the (always >= 0) collision overestimate",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch is a {d x w} counter grid: one explode over tokens,
    d salted hashes per token (a small array explode — no joins), one
    map-side-combinable groupBy into d*w=256 cells. That is the
    mergeable-state shape: 1000 executors each reduce their split to a
    KB-sized grid and the grids ADD. Heavy-hitter probes then read d
    cells per candidate token via a broadcast join. Everything is
    BIGINT; min-of-counters is exact on both engines."""
    tok = _tokens(spark, sf_dir).select("w")
    salted = tok.select(
        "w",
        F.posexplode(
            F.array(
                *[
                    h60_col(F.concat(F.col("w"), F.lit(f"#{r}"))) % CMS_W
                    for r in range(CMS_D)
                ]
            )
        ).alias("r", "idx"),
    )
    cells = salted.groupBy("r", "idx").agg(F.count(F.lit(1)).alias("c"))
    exact = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n_exact"))
    top = (
        exact.orderBy(F.col("n_exact").desc(), F.col("w").asc())
        .limit(CMS_TOP)
    )
    probes = top.select(
        "w",
        "n_exact",
        F.posexplode(
            F.array(
                *[
                    h60_col(F.concat(F.col("w"), F.lit(f"#{r}"))) % CMS_W
                    for r in range(CMS_D)
                ]
            )
        ).alias("r", "idx"),
    )
    return (
        cells.join(F.broadcast(probes), ["r", "idx"])
        .groupBy(F.col("w").alias("token"), "n_exact")
        .agg(
            F.min("c").cast("long").alias("cms_estimate"),
            (F.min("c") - F.first("n_exact")).cast("long").alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram LM quality scoring (Laplace-smoothed)
# ---------------------------------------------------------------------------

BIGRAM_LOW_MICRO = -3_450_000  # avg ln p(w2|w1) < -3.45 → incoherent doc


@register(
    "bigram_lm_quality",
    f"""
    WITH w AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}') AS ws
      FROM documents
    ),
    tok AS (SELECT unnest(ws) AS t FROM w),
    vocab AS (SELECT count(DISTINCT t) AS v FROM tok),
    grams AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bg
      FROM w WHERE len(ws) >= 2
    ),
    c2 AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
    c1 AS (
      SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
      FROM c2 GROUP BY w1
    ),
    model AS (
      SELECT c2.bg,
             {_micronats_sql(
                 'CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + (SELECT v FROM vocab))'
             )} AS lp
      FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1
    ),
    per_doc AS (
      SELECT g.doc_id, g.lang, count(*) AS n_bg,
             CAST(sum(m.lp) AS BIGINT) AS sum_lp
      FROM grams g JOIN model m ON g.bg = m.bg
      GROUP BY g.doc_id, g.lang
    ),
    scored AS (
      SELECT lang,
             CAST(floor(CAST(sum_lp AS DOUBLE) / n_bg) AS BIGINT) AS score_micro
      FROM per_doc
    )
    SELECT lang, count(*) AS n_docs,
           ROUND(avg(CAST(score_micro AS DOUBLE)) / 1000000, 6)
             AS avg_bigram_logprob,
           CAST(sum(CASE WHEN score_micro < {BIGRAM_LOW_MICRO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
    FROM scored GROUP BY lang
    """,
    "Bigram LM quality scoring: Laplace-smoothed p(w2|w1) from corpus "
    "bigram/context counts, per-doc mean log-prob in integer micro-nats "
    "— the fluency-filter complement to the unigram model (captures "
    "word-order incoherence unigrams cannot)",
)
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams form per-row (posexplode + lead under the doc partition,
    same shape as top_bigrams_per_lang); the model is bigram-TYPE-sized
    (c2 → c1 reduces c2 again), so log() runs once per distinct bigram
    and docs join the integer micro-nat model by bigram string. At
    100 TB the model table is at most vocab², still tiny relative to
    the corpus, so AQE broadcast-hashes the model side and the corpus
    bigrams never shuffle for the scoring join."""
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.posexplode(words).alias("pos", "w")
    )
    tok.persist()
    vocab = tok.agg(F.countDistinct("w").alias("v"))
    win = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("w2", F.lead("w", 1).over(win))
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id", "lang", F.concat_ws(" ", "w", "w2").alias("bg")
        )
    )
    grams.persist()
    c2 = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c2.persist()
    c1 = (
        c2.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("c2").cast("long").alias("c1"))
    )
    model = (
        c2.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            _micronats_col(
                (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v"))
            ).alias("lp"),
        )
    )
    per_doc = (
        grams.join(model, "bg")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bg"),
            F.sum("lp").cast("long").alias("sum_lp"),
        )
    )
    scored = per_doc.select(
        "lang",
        F.floor(F.col("sum_lp").cast("double") / F.col("n_bg"))
        .cast("long")
        .alias("score_micro"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("score_micro").cast("double")) / 1000000.0, 6).alias(
            "avg_bigram_logprob"
        ),
        F.sum(
            F.when(F.col("score_micro") < BIGRAM_LOW_MICRO, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_low_quality"),
    )


# ---------------------------------------------------------------------------
# Fuzzy matching via deletion-variant blocking (record linkage)
# ---------------------------------------------------------------------------

FUZZY_DIGITS = 9  # Customer#DDDDDDDDD


@register(
    "fuzzy_name_matching",
    f"""
    WITH names AS (
      SELECT c_custkey AS id, substr(c_name, 10, {FUZZY_DIGITS}) AS d
      FROM customer
    ),
    variants AS (
      SELECT id, d, i,
             substr(d, 1, i) || '*' || substr(d, i + 2) AS vkey
      FROM names, (SELECT unnest(generate_series(0, {FUZZY_DIGITS - 1})) AS i)
    )
    SELECT a.i AS edit_pos, count(*) AS n_pairs,
           CAST(min(a.id) AS BIGINT) AS min_id_a,
           CAST(max(b.id) AS BIGINT) AS max_id_b
    FROM variants a JOIN variants b ON a.vkey = b.vkey AND a.i = b.i
    WHERE a.id < b.id AND a.d <> b.d
    GROUP BY a.i
    """,
    "Record linkage by single-substitution fuzzy match: deletion-variant "
    "blocking (FastSS) — each name emits 9 wildcard variants, pairs "
    "agreeing on a variant differ in exactly that position. Linear "
    "candidate generation, no quadratic all-pairs, no edit-distance UDF",
)
def fuzzy_name_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each of the N names explodes into {FUZZY_DIGITS} wildcard keys —
    candidate generation is one equi-join on the variant key, so cost
    scales with the number of true near-matches, never N². The same
    blocking runs any edit-distance-1 workload (spell variants, typo'd
    entity names); here the verify step is free because agreeing on a
    variant while differing as strings IS the edit-1 predicate for the
    substitution case. At 100 TB the variant table is 9x names — a
    shuffle of short strings — and heavy wildcard keys (shared
    boilerplate) would take the MAX_BUCKET-style cap the LSH family
    uses."""
    names = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.substring("c_name", 10, FUZZY_DIGITS).alias("d"),
    )
    variants = names.select(
        "id",
        "d",
        F.posexplode(
            F.array(
                *[
                    F.concat(
                        F.substring("d", 1, i),
                        F.lit("*"),
                        F.substring("d", i + 2, FUZZY_DIGITS),
                    )
                    for i in range(FUZZY_DIGITS)
                ]
            )
        ).alias("i", "vkey"),
    )
    a = variants.select(
        F.col("id").alias("id_a"), F.col("d").alias("d_a"), "i", "vkey"
    )
    b = variants.select(
        F.col("id").alias("id_b"), F.col("d").alias("d_b"), "i", "vkey"
    )
    return (
        a.join(b, ["vkey", "i"])
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("d_a") != F.col("d_b")))
        .groupBy(F.col("i").alias("edit_pos"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("id_a").cast("long").alias("min_id_a"),
            F.max("id_b").cast("long").alias("max_id_b"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage (OOV-rate distribution)
# ---------------------------------------------------------------------------

VOCAB_SIZE = 1000  # top-K corpus tokens play the tokenizer vocabulary


@register(
    "tokenizer_vocab_coverage",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    vocab AS (SELECT w FROM freq ORDER BY n DESC, w LIMIT {VOCAB_SIZE}),
    per_doc AS (
      SELECT t.doc_id, t.lang, count(*) AS n_tok,
             CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM tok t LEFT JOIN vocab v ON t.w = v.w
      GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           ROUND(avg(CAST(n_oov AS DOUBLE) / n_tok), 6) AS avg_oov_frac,
           CAST(sum(CASE WHEN n_oov * 2 > n_tok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_oov_docs,
           CAST(sum(n_oov) AS BIGINT) AS total_oov
    FROM per_doc GROUP BY lang
    """,
    f"Tokenizer-vocabulary coverage: per-language out-of-vocabulary "
    f"rate against the top-{VOCAB_SIZE} corpus tokens (deterministic "
    "frequency-then-token tie-break) — the coverage check run before "
    "committing to a tokenizer vocab",
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass: corpus token frequencies (vocab-sized shuffle), top-K
    cut with a (n DESC, w ASC) total order so the boundary is identical
    on both engines, vocab broadcast into a left join flagging OOV
    tokens, then per-doc → per-lang rollups. 'High-OOV doc' uses
    integer cross-multiplication — no float threshold."""
    from ..operators import dedup as dedup_ops

    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.explode(words).alias("w")
    )
    tok = dedup_ops._persist(tok)  # frequency pass + join both read it
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(VOCAB_SIZE)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.round(F.avg(F.col("n_oov").cast("double") / F.col("n_tok")), 6).alias(
            "avg_oov_frac"
        ),
        F.sum(
            F.when(F.col("n_oov") * 2 > F.col("n_tok"), 1).otherwise(0)
        ).alias("n_high_oov_docs"),
        F.sum("n_oov").alias("total_oov"),
    )


# ---------------------------------------------------------------------------
# Embedding outliers by median/MAD distance to the label centroid
# ---------------------------------------------------------------------------

EMB_OUT_QSCALE = 1000
EMB_OUT_DIM = 64
EMB_OUT_K = 3  # dist > median + 3*MAD → outlier


@register(
    "embedding_outlier_mad",
    f"""
    WITH q AS (
      SELECT label, vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {EMB_OUT_QSCALE}) AS BIGINT)
             ) AS q
      FROM embeddings
    ),
    cent AS (
      SELECT label, dims.d,
             CAST(floor(CAST(sum(q[d]) AS DOUBLE) / count(*)) AS BIGINT) AS c
      FROM q, (SELECT unnest(generate_series(1, {EMB_OUT_DIM})) AS d) dims
      GROUP BY label, dims.d
    ),
    centl AS (SELECT label, list(c ORDER BY d) AS c FROM cent GROUP BY label),
    dist AS (
      SELECT q.label, q.vec_id,
             list_sum(list_transform(generate_series(1, {EMB_OUT_DIM}),
               i -> (q.q[i] - c.c[i]) * (q.q[i] - c.c[i]))) AS dist
      FROM q JOIN centl c USING (label)
    ),
    med AS (SELECT label, median(dist) AS med_dist FROM dist GROUP BY label),
    mad AS (
      SELECT d.label, median(abs(d.dist - m.med_dist)) AS mad_dist
      FROM dist d JOIN med m USING (label) GROUP BY d.label
    )
    SELECT d.label, count(*) AS n_vecs,
           CAST(sum(CASE WHEN d.dist > m.med_dist + {EMB_OUT_K} * md.mad_dist
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(m.med_dist, 1) AS med_dist,
           ROUND(md.mad_dist, 1) AS mad_dist
    FROM dist d JOIN med m USING (label) JOIN mad md USING (label)
    GROUP BY d.label, m.med_dist, md.mad_dist
    """,
    "Embedding outlier detection: quantized-integer distance to the "
    "per-label centroid, flagged by the robust median + 3*MAD rule — "
    "the mislabeled/garbage-embedding sweep of an embedding-space "
    "curation pipeline (exact arithmetic end to end)",
)
def embedding_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroids via one aggregate of 64 element-wise sums (no explode);
    distances as integer zip_with/aggregate HOFs. Median and MAD come
    from ONE per-label (dist, cnt) histogram: a single shuffle collapses
    the N distance rows to their distinct-value support, then both exact
    medians are inline window expressions over that histogram (smallest
    value whose cumulative count reaches the middle positions — same
    semantics as sort-based median, even counts average the two middle
    values). Previously the persisted dist frame was scanned three times
    with two sort-based medians over N rows. The histogram is the 100×
    form: mergeable per-partition counts, windows over the (small)
    support, no cross-engine float drift (integer distances end to end).

    Emitted as ONE spark.sql statement: the 64-wide centroid aggregate
    built column-by-column through the DataFrame API spent ~0.8 s per
    call just constructing Column objects over Py4J — a single SQL parse
    is milliseconds for the identical Catalyst plan."""
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("emb_out_src")
    sums = ", ".join(f"sum(q[{d}]) AS s{d}" for d in range(EMB_OUT_DIM))
    cent_arr = ", ".join(
        f"CAST(floor(CAST(s{d} AS DOUBLE) / n) AS BIGINT)"
        for d in range(EMB_OUT_DIM)
    )
    return spark.sql(f"""
    WITH q AS (
      SELECT label,
             transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {EMB_OUT_QSCALE}) AS BIGINT)
             ) AS q
      FROM emb_out_src
    ),
    agg AS (SELECT label, count(1) AS n, {sums} FROM q GROUP BY label),
    cent AS (SELECT label, array({cent_arr}) AS c FROM agg),
    hist AS (
      SELECT /*+ BROADCAST(c) */ q.label,
             aggregate(zip_with(q.q, c.c, (a, b) -> (a - b) * (a - b)),
                       CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dist,
             count(1) AS cnt
      FROM q JOIN cent c ON q.label = c.label
      GROUP BY q.label, 2
    ),
    m1 AS (
      SELECT *,
             sum(cnt) OVER (PARTITION BY label ORDER BY dist
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY label) AS n
      FROM hist
    ),
    m2 AS (
      SELECT *,
             (min(CASE WHEN cum >= floor((n + 1) / 2) THEN dist END)
                OVER (PARTITION BY label)
            + min(CASE WHEN cum >= floor(n / 2) + 1 THEN dist END)
                OVER (PARTITION BY label)) / double(2) AS med_dist
      FROM m1
    ),
    m3 AS (
      SELECT label, dist, cnt, n, med_dist,
             abs(dist - med_dist) AS adist,
             sum(cnt) OVER (PARTITION BY label ORDER BY abs(dist - med_dist)
                            ROWS UNBOUNDED PRECEDING) AS cum2
      FROM m2
    ),
    m4 AS (
      SELECT *,
             (min(CASE WHEN cum2 >= floor((n + 1) / 2) THEN adist END)
                OVER (PARTITION BY label)
            + min(CASE WHEN cum2 >= floor(n / 2) + 1 THEN adist END)
                OVER (PARTITION BY label)) / double(2) AS mad_dist
      FROM m3
    )
    SELECT label, sum(cnt) AS n_vecs,
           sum(CASE WHEN dist > med_dist + {EMB_OUT_K} * mad_dist
                    THEN cnt ELSE CAST(0 AS BIGINT) END) AS n_outliers,
           round(med_dist, 1) AS med_dist,
           round(mad_dist, 1) AS mad_dist
    FROM m4
    GROUP BY label, med_dist, mad_dist
    """)


# ---------------------------------------------------------------------------
# Prefix-truncation dedup (crawl truncation duplicates)
# ---------------------------------------------------------------------------

PREFIX_WORDS = 10


@register(
    "dedup_prefix_truncation",
    f"""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    pref AS (
      SELECT doc_id, lang, n_chars,
             array_to_string(w[1:{PREFIX_WORDS}], ' ') AS p
      FROM w WHERE len(w) >= {PREFIX_WORDS}
    ),
    grp AS (
      SELECT lang, p, count(*) AS n_docs,
             CAST(max(n_chars) AS BIGINT) AS kept_chars,
             CAST(sum(n_chars) - max(n_chars) AS BIGINT) AS dropped_chars
      FROM pref GROUP BY lang, p
      HAVING count(*) > 1
    )
    SELECT lang,
           count(*) AS n_groups,
           CAST(sum(n_docs) AS BIGINT) AS n_affected,
           CAST(sum(dropped_chars) AS BIGINT) AS chars_saved
    FROM grp GROUP BY lang
    """,
    f"Prefix-truncation dedup accounting: documents sharing their first "
    f"{PREFIX_WORDS} words (the truncated-crawl duplicate pattern exact "
    "dedup misses), keep-longest policy, per-language savings",
)
def dedup_prefix_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix extraction is row-wise (slice + concat_ws — no explode);
    one shuffle on (lang, prefix-hash-sized strings); both rollups share
    that partitioning prefix. At 100 TB the prefix would hash before the
    shuffle — here it stays a string for oracle parity."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    pref = (
        docs.select(
            "lang",
            "n_chars",
            words.alias("w"),
        )
        .filter(F.size("w") >= PREFIX_WORDS)
        .select(
            "lang",
            "n_chars",
            F.concat_ws(" ", F.slice("w", 1, PREFIX_WORDS)).alias("p"),
        )
    )
    grp = (
        pref.groupBy("lang", "p")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_chars").alias("kept_chars"),
            (F.sum("n_chars") - F.max("n_chars")).alias("dropped_chars"),
        )
        .filter(F.col("n_docs") > 1)
    )
    return grp.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_docs").alias("n_affected"),
        F.sum("dropped_chars").alias("chars_saved"),
    )


# ---------------------------------------------------------------------------
# Event-rate anomaly detection (z-score on hourly counts)
# ---------------------------------------------------------------------------

ANOM_Z_NUM = 3  # |count - mean| > 3 * stddev → anomalous hour


@register(
    "event_rate_anomaly",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma,
             count(*) AS n_hours
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type,
           CAST(s.n_hours AS BIGINT) AS n_hours,
           CAST(sum(CASE WHEN abs(h.n - s.mu) > {ANOM_Z_NUM} * s.sigma
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
           CAST(max(h.n) AS BIGINT) AS peak_count
    FROM hourly h JOIN stats s USING (event_type)
    GROUP BY h.event_type, s.n_hours
    """,
    "Event-rate anomaly sweep: hourly counts per event type, hours "
    "beyond 3 sigma of the type's mean flagged — the traffic-spike "
    "monitor of an ingestion pipeline (integer counts → exact stats)",
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly pre-aggregation shrinks the fact before anything else;
    per-type stats are a tiny second aggregate broadcast back into the
    flagging join. Counts are integers, so mean/stddev are identical
    doubles on both engines."""
    from ..operators import dedup as dedup_ops

    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hourly = dedup_ops._persist(hourly)
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.stddev_samp("n").alias("sigma"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n_hours")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("n") - F.col("mu"))
                    > ANOM_Z_NUM * F.col("sigma"),
                    1,
                ).otherwise(0)
            ).alias("n_anomalous"),
            F.max("n").alias("peak_count"),
        )
        .select("event_type", "n_hours", "n_anomalous", "peak_count")
    )


# ---------------------------------------------------------------------------
# WebDataset tar-shard round trip
# ---------------------------------------------------------------------------

WDS_SHARDS = 8


@register(
    "webdataset_roundtrip",
    f"""
    SELECT 'shard-' || CAST(doc_id % {WDS_SHARDS} AS VARCHAR) AS shard,
           count(*) AS n_samples,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS txt_bytes,
           CAST(sum({h60_sql('text')} % 1000003) AS BIGINT) AS checksum
    FROM documents
    GROUP BY 1
    """,
    "WebDataset tar-shard round trip: documents packed into "
    f"{WDS_SHARDS} deterministic tar shards (txt + json members per "
    "sample, stdlib tarfile in mapInPandas), decoded back, and "
    "checksummed per shard — the multimodal container format of "
    "large-scale training pipelines, verified against the source table",
)
def webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build members (txt payload + json sidecar) → encode_shards (one
    shuffle on shard id; deterministic bytes) → decode_members (one
    sequential pass per shard) → per-shard aggregate over the decoded
    txt payloads. The oracle aggregates the SOURCE table directly —
    equality proves the container preserved every payload byte."""
    from ..operators.dedup import h60_col
    from ..sources.webdataset import decode_members, encode_shards

    docs = _t(spark, sf_dir, "documents")
    txt = docs.select(
        F.concat(F.lit("shard-"), (F.col("doc_id") % WDS_SHARDS).cast("string")).alias("shard"),
        F.format_string("%012d", F.col("doc_id")).alias("key"),
        F.lit("txt").alias("ext"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    meta = docs.select(
        F.concat(F.lit("shard-"), (F.col("doc_id") % WDS_SHARDS).cast("string")).alias("shard"),
        F.format_string("%012d", F.col("doc_id")).alias("key"),
        F.lit("json").alias("ext"),
        F.encode(F.to_json(F.struct("lang", "source")), "UTF-8").alias("payload"),
    )
    shards = encode_shards(txt.unionByName(meta), num_partitions=WDS_SHARDS)
    decoded = decode_members(shards)
    return (
        decoded.filter(F.col("ext") == "txt")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.octet_length("payload")).alias("txt_bytes"),
            F.sum(h60_col(F.col("payload")) % 1000003).alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# JPEG encode→decode pipeline (real baseline codec, no Pillow)
# ---------------------------------------------------------------------------

JPEG_MOD = 50  # one synthetic image per JPEG_MOD-th document


@register(
    "jpeg_roundtrip_pipeline",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(16 + (doc_id % 5) * 8) AS BIGINT) AS w_sum,
           CAST(sum(16 + (doc_id % 3) * 8) AS BIGINT) AS h_sum,
           CAST(count(*) * 3 AS BIGINT) AS ch_sum
    FROM documents WHERE doc_id % {JPEG_MOD} = 0
    """,
    "JPEG pipeline e2e: deterministic synthetic images encoded to real "
    "baseline JPEG (4:4:4 and 4:2:0 alternating) and decoded back "
    "through the Arrow-batched decode_image slot — dims must survive "
    "the lossy round trip exactly (numpy codec, no Pillow)",
)
def jpeg_roundtrip_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two designed Python boundaries (encode, decode), both Arrow-
    batched mapInPandas over narrow frames — the webdataset_roundtrip
    shape. The decoded WIDTH/HEIGHT equal the synthesized dims exactly
    (JPEG is lossy in pixels, exact in geometry), so the oracle is the
    closed-form dims sum over the same doc_id arithmetic. A payload the
    decoder rejects would surface as a NULL row and fail the count."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators import multimodal

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % JPEG_MOD == 0)
        .select("doc_id")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                h = 16 + int(doc_id) % 3 * 8
                w = 16 + int(doc_id) % 5 * 8
                yy, xx = np.mgrid[0:h, 0:w]
                base = 128 + 90 * np.sin((yy + int(doc_id) % 7) / 9.0) * np.cos(
                    xx / 11.0
                )
                img = np.stack(
                    [np.clip(base + 15 * c, 0, 255) for c in range(3)], axis=-1
                ).astype(np.uint8)
                sub = "4:2:0" if int(doc_id) % 2 else "4:4:4"
                payloads.append(encode_jpeg(img, quality=88, subsample=sub))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "data": payloads}
            )

    media = docs.mapInPandas(encode, "media_id long, data binary")
    dec = multimodal.decode_image(media)
    return dec.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("width").alias("w_sum"),
        F.sum("height").alias("h_sum"),
        F.sum("channels").alias("ch_sum"),
    )


# ---------------------------------------------------------------------------
# WAV audio stats (real PCM decode — completes the modality trio)
# ---------------------------------------------------------------------------

WAV_MOD = 100


@register(
    "wav_audio_stats",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_clips,
           CAST(sum(500 + doc_id % 250) AS BIGINT) AS frames_sum,
           CAST(sum(8000 + (doc_id % 3) * 4000) AS BIGINT) AS rate_sum,
           CAST(sum(1 + doc_id % 2) AS BIGINT) AS ch_sum
    FROM documents WHERE doc_id % {WAV_MOD} = 0
    """,
    "Audio-modality decode e2e: deterministic synthetic PCM WAV clips "
    "(varying rate/channels/length by doc_id) decoded through the "
    "Arrow-batched decode_audio slot — framing stats must match the "
    "closed-form oracle exactly (stdlib wave + numpy, no soundfile)",
)
def wav_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-boundary shape as jpeg_roundtrip_pipeline /
    gif_frame_sampling: encode and decode are Arrow-batched mapInPandas
    over narrow frames; WAV framing (rate, channels, frame count)
    survives the PCM round trip exactly, so the oracle is the doc_id
    arithmetic that generated the clips."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators import multimodal

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % WAV_MOD == 0)
        .select("doc_id")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.codecs import encode_wav

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 500 + d % 250
                rate = 8000 + (d % 3) * 4000
                ch = 1 + d % 2
                t = np.arange(n * ch, dtype=np.int64).reshape(n, ch)
                samples = ((t * (d % 7 + 1)) % 4096 - 2048).astype(np.int16)
                payloads.append(encode_wav(samples, rate=rate))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": payloads})

    media = docs.mapInPandas(encode, "media_id long, data binary")
    dec = multimodal.decode_audio(media)
    return dec.agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_frames").alias("frames_sum"),
        F.sum("sample_rate").cast("long").alias("rate_sum"),
        F.sum("n_channels").cast("long").alias("ch_sum"),
    )


# ---------------------------------------------------------------------------
# GIF frame sampling (real animated container, LZW codec)
# ---------------------------------------------------------------------------

GIF_MOD = 100  # one synthetic animation per GIF_MOD-th document


@register(
    "gif_frame_sampling",
    f"""
    WITH a AS (
      SELECT doc_id, (2 + doc_id % 4 + 1) // 2 AS m
      FROM documents WHERE doc_id % {GIF_MOD} = 0
    )
    SELECT CAST(sum(m) AS BIGINT) AS n_frames_sampled,
           CAST(sum(50 * m * (m - 1)) AS BIGINT) AS ts_sum,
           CAST(sum(m * 8) AS BIGINT) AS w_sum,
           CAST(sum(m * (8 + (doc_id % 3) * 4)) AS BIGINT) AS h_sum
    FROM a
    """,
    "Video-modality frame sampling e2e: deterministic synthetic GIF "
    "animations (2-5 frames, 50 ms delays) decoded by the built-in LZW "
    "codec and sampled every 100 ms in the Arrow-batched frame-explode "
    "slot — sampled counts/timestamps/dims must match the closed-form "
    "oracle exactly",
)
def gif_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-boundary shape as jpeg_roundtrip_pipeline (encode,
    decode+sample — both Arrow-batched mapInPandas over narrow frames).
    Frame geometry and timing are doc_id arithmetic, so the oracle is
    closed-form: sampling every 100 ms over 50 ms-delay frames keeps
    every other frame, m = ceil(n/2) of n = 2 + doc_id%4 frames. A
    frame the decoder drops or mis-times breaks the sums."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators import multimodal

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % GIF_MOD == 0)
        .select("doc_id")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.gif import encode_gif

        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
             [255, 255, 0], [0, 255, 255], [255, 0, 255], [255, 255, 255]],
            dtype=np.uint8,
        )
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 2 + d % 4
                h = 8 + d % 3 * 4
                w = 8
                yy, xx = np.mgrid[0:h, 0:w]
                frames = np.stack(
                    [pal[(yy + xx + fi + d) % 8] for fi in range(n)]
                )
                payloads.append(encode_gif(frames, delays_ms=50))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": payloads})

    media = docs.mapInPandas(encode, "media_id long, data binary")
    frames = multimodal.decode_video_frames(media, every_ms=100)
    return frames.agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.sum("frame_ts_ms").alias("ts_sum"),
        F.sum("width").cast("long").alias("w_sum"),
        F.sum("height").cast("long").alias("h_sum"),
    )


# ---------------------------------------------------------------------------
# Predicate UPDATE over the lake table
# ---------------------------------------------------------------------------

UPDATE_PRED = "event_type = 'click'"


@register(
    "update_where_events",
    f"""
    SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN {UPDATE_PRED}
                    THEN CAST(floor(value * 100) AS BIGINT) * 2
                    ELSE CAST(floor(value * 100) AS BIGINT) END) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY event_type
    """,
    "Predicate UPDATE over the lake table: stat-admitting files "
    "rewritten in place with SET expressions (matching rows doubled), "
    "untouched files carried — end state must equal the oracle's CASE "
    "projection",
)
def update_where_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loads events into a lake table, runs LakeWriter.update_where
    (file-pruned in-place rewrite doubling matching rows' cents), reads
    the final snapshot back. Values integerize to cents BEFORE the
    update so both engines double exact integers."""
    import os
    import tempfile
    import uuid

    from ..lake import LakeCatalog, LakeWriter

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_upd_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_upd"), pk=["event_id"])
    w.append(ev)
    w.update_where(UPDATE_PRED, {"value_cents": "value_cents * 2"})
    return (
        cat.table("events_upd")
        .read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-k eval-set sampling (deterministic per-stratum draw)
# ---------------------------------------------------------------------------

EVAL_K = 50


@register(
    "eval_set_exact_k",
    f"""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {h60_sql("'eval:' || CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang,
           count(*) AS n_selected,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM ranked WHERE rk <= {EVAL_K}
    GROUP BY lang
    """,
    f"Exact-k eval-set draw: the {EVAL_K} lowest-hash documents per "
    "language — a uniform, content-stable sample of EXACTLY k per "
    "stratum (rate-based sampling can't promise counts), the held-out "
    "eval construction step of a training pipeline",
)
def eval_set_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One window shuffle on lang ordered by the doc-id hash (doc_id
    tie-break keeps the total order engine-agnostic); at 100 TB this is
    a per-stratum top-k — rank truncation happens before anything else
    moves."""
    docs = _t(spark, sf_dir, "documents")
    h = h60_col(F.concat(F.lit("eval:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= EVAL_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution drift between corpus halves
# ---------------------------------------------------------------------------

DRIFT_PCT = 20  # |share_new - share_old| > 20% relative → drift flag


@register(
    "lang_share_drift",
    f"""
    WITH halves AS (
      SELECT lang,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
             CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
             CAST(sum(n_new) AS BIGINT) AS t_new
      FROM halves
    )
    SELECT h.lang, h.n_old, h.n_new,
           CASE WHEN abs(h.n_new * t.t_old - h.n_old * t.t_new) * 100
                     > {DRIFT_PCT} * h.n_old * t.t_new
                THEN 1 ELSE 0 END AS drifted
    FROM halves h, tot t
    """,
    "Language-share drift between two corpus halves (doc-id parity "
    "plays yesterday/today): relative share change beyond 20% flags, "
    "computed with integer cross-multiplication — no float thresholds, "
    "bit-identical across engines",
)
def lang_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate builds both halves' counts; totals come back as a
    broadcast 1-row cross join. The drift test is pure integer
    arithmetic — the distribution-shift monitor between corpus
    refreshes, exact on both engines."""
    docs = _t(spark, sf_dir, "documents")
    halves = docs.groupBy("lang").agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("n_new"),
    )
    tot = halves.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    drift = (
        F.abs(F.col("n_new") * F.col("t_old") - F.col("n_old") * F.col("t_new"))
        * 100
        > DRIFT_PCT * F.col("n_old") * F.col("t_new")
    )
    return halves.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_old",
        "n_new",
        F.when(drift, 1).otherwise(0).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# Iterative BPE tokenizer training (the merge LOOP, not just round one)
# ---------------------------------------------------------------------------

BPE_MERGE_ROUNDS = 3


def _bpe_train_sql(rounds: int = BPE_MERGE_ROUNDS) -> str:
    """Oracle twin of bpe_train_merges: each round is one chained CTE
    pair (count → top-1) plus a re-segmentation CTE; the scalar
    subqueries on m{r} mirror the Spark side's 1-row collect."""
    blocks = [
        f"""
    wc AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split_regex(trim(lower(text)),
                                             '{TOKEN_SPLIT}')) AS w
            FROM documents)
      WHERE length(w) >= 1 GROUP BY w
    ),
    s0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS st, n
           FROM wc)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        blocks.append(f"""
    p{r} AS (
      SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                                     i -> sy[i] || ' ' || sy[i + 1])) AS pair,
               n
        FROM (SELECT string_split(st, ' ') AS sy, n FROM {prev})
      ) GROUP BY pair
    ),
    m{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1)""")
        if r < rounds:
            blocks.append(f"""
    s{r} AS (
      SELECT trim(replace(' ' || st || ' ',
                          ' ' || (SELECT pair FROM m{r}) || ' ',
                          ' ' || replace((SELECT pair FROM m{r}), ' ', '')
                              || ' ')) AS st,
             n
      FROM {prev}
    )""")
    sel = " UNION ALL ".join(
        f"SELECT {r} AS merge_round, pair, cnt FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",".join(blocks) + " " + sel


@register(
    "bpe_train_merges",
    _bpe_train_sql(),
    f"Iterative BPE tokenizer training: {BPE_MERGE_ROUNDS} merge rounds "
    "over the word-frequency table — each round counts adjacent symbol "
    "pairs (weighted by word count), adopts the (count DESC, pair ASC) "
    "winner, and re-segments; returns the learned merge table",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE training loop, distributed the way k-means is: the
    symbol-state table lives in the cluster (persisted vocab × state
    string — the vocab aggregate, tiny relative to the corpus), each
    round is one map-side pair explosion + one (pair) aggregate, and
    only the single winning pair crosses to the driver (a 1-row
    bounded collect, like kmeans' centroid rows). Merge application is
    a literal string replace with space boundaries — leftmost
    non-overlapping single-pass in BOTH engines (identical scan
    semantics), so re-segmentation stays bit-identical; an
    immediately-adjacent repeat of the same pair defers to the next
    round (fastBPE's apply has the same property). At 100 TB the
    corpus is scanned ONCE (the wc aggregate); every later round costs
    |vocab|, not corpus bytes."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    wc = (
        docs.select(F.explode(words).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    st = wc.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("st"), "n"
    ).persist()
    merges: list[tuple[int, str, int]] = []
    cur = st
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        seg = cur.select(F.split("st", " ").alias("sy"), "n")
        idx = F.when(
            F.size("sy") >= 2, F.sequence(F.lit(1), F.size("sy") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = seg.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("sy", i),
                        F.element_at("sy", i + 1),
                    ),
                )
            ).alias("pair"),
            "n",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()[0]
        )
        merges.append((rnd, top["pair"], int(top["cnt"])))
        if rnd < BPE_MERGE_ROUNDS:
            merged = top["pair"].replace(" ", "")
            cur = cur.select(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("st"), F.lit(" ")),
                        F.lit(f" {top['pair']} "),
                        F.lit(f" {merged} "),
                    )
                ).alias("st"),
                "n",
            )
    st.unpersist()
    return local_rows_df(spark, 
        merges, "merge_round int, pair string, cnt bigint"
    )


# ---------------------------------------------------------------------------
# Character-entropy quality bands (gibberish / degenerate-doc detector)
# ---------------------------------------------------------------------------

# Shannon char entropy in micro-nats; word-soup English sits ~2.7-2.9,
# repetitive/degenerate docs fall below. The threshold is calibrated so
# the low band is non-empty on the synthetic corpus.
ENTROPY_LOW_MICRO = 2_770_000


@register(
    "char_entropy_quality",
    f"""
    WITH ch AS (
      SELECT doc_id, lang,
             unnest(string_split(regexp_replace(lower(text), '\\s+', '', 'g'),
                                 '')) AS c
      FROM documents
    ),
    hist AS (
      SELECT doc_id, lang, c, CAST(count(*) AS BIGINT) AS n
      FROM ch GROUP BY doc_id, lang, c
    ),
    ent AS (
      SELECT doc_id, lang,
             {_micronats_sql('CAST(sum(n) AS DOUBLE)')}
               - CAST(floor(
                   CAST(sum(n * {_micronats_sql('CAST(n AS DOUBLE)')})
                        AS DOUBLE)
                   / sum(n)) AS BIGINT) AS h_micro
      FROM hist GROUP BY doc_id, lang
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           ROUND(avg(CAST(h_micro AS DOUBLE)) / 1000000, 6) AS avg_entropy,
           CAST(sum(CASE WHEN h_micro < {ENTROPY_LOW_MICRO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy
    FROM ent GROUP BY lang
    """,
    "Per-document Shannon character entropy (integer micro-nats, exact "
    "cross-engine) -> per-lang mean entropy + low-entropy doc count; "
    "the cheap degenerate-text detector of a quality pipeline",
)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H(doc) = ln N - (1/N)·Σ n_c·ln n_c over the doc's char
    histogram, all in per-row integerized micro-nats (the determinism
    contract at module top): the inner Σ is an exact integer sum, the
    division floors, so every doc's h_micro is bit-identical across
    engines. Scale shape: explode-per-char is linear in corpus BYTES
    (the same order as reading the data); the histogram aggregate is
    (doc, char)-keyed — map-side combined, alphabet-bounded state per
    doc; no shuffle carries raw text."""
    docs = _t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), r"\s+", ""), "")
        ).alias("c"),
    )
    hist = chars.groupBy("doc_id", "lang", "c").agg(
        F.count(F.lit(1)).alias("n")
    )
    ent = hist.groupBy("doc_id", "lang").agg(
        (
            _micronats_col(F.sum("n").cast("double"))
            - F.floor(
                F.sum(F.col("n") * _micronats_col(F.col("n").cast("double")))
                .cast("double")
                / F.sum("n")
            ).cast("long")
        ).alias("h_micro")
    )
    return ent.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("h_micro").cast("double")) / 1000000.0, 6).alias(
            "avg_entropy"
        ),
        F.sum(
            F.when(F.col("h_micro") < ENTROPY_LOW_MICRO, 1).otherwise(0)
        ).cast("long").alias("n_low_entropy"),
    )


# ---------------------------------------------------------------------------
# PQ recall evaluation: ADC ranking vs exact integer L2
# ---------------------------------------------------------------------------


@register(
    "pq_recall_eval",
    None,  # placeholder replaced below (needs codebook literals)
    "",
)
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the PQ family: recall@10 of the
    PQ-reconstruction ranking against exact quantized-L2 brute force,
    on the same deterministic query sample as ann_recall_eval. Corpus
    rows encode ONCE (codes → reconstructed integer vector, a
    write-time cost in a real index); each (query, corpus) pair then
    pays one 64-dim integer L2 on both rankings — the reconstruction
    ranking IS what an ADC scan computes, expressed pairwise so a
    broadcast query set needs no driver-side ADC tables. All
    arithmetic is int64 → bit-identical oracle."""
    from ..operators.similarity import PQ_QSCALE, pq_codebooks, pq_encode

    books = pq_codebooks()
    emb = _t(spark, sf_dir, "embeddings")
    coded = pq_encode(emb)
    cb_arrays = []
    for s, codes in enumerate(books):
        lits = ", ".join(
            "array(" + ", ".join(str(v) for v in c) + ")" for c in codes
        )
        cb_arrays.append(f"element_at(array({lits}), __pq_c{s})")
    recon = f"flatten(array({', '.join(cb_arrays)}))"
    qvec = (
        f"transform(embedding, x -> floor(CAST(x AS DOUBLE) * {PQ_QSCALE}))"
    )
    v = coded.select(
        "vec_id",
        F.expr(qvec).alias("qq"),
        F.expr(recon).alias("recon"),
    )
    v.persist()
    q = v.filter(F.col("vec_id") % RECALL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("qq").alias("qv")
    )
    l2 = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    pairs = (
        v.join(F.broadcast(q), v.vec_id != q.qid)
        .select(
            "qid",
            "vec_id",
            F.expr(l2.format(a="qq", b="qv")).alias("d_exact"),
            F.expr(l2.format(a="recon", b="qv")).alias("d_pq"),
        )
    )
    pairs.persist()
    exact_rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("d_exact"), F.col("vec_id"))
    )
    pq_rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("d_pq"), F.col("vec_id"))
    )
    brute = (
        pairs.withColumn("rn", exact_rn)
        .filter(F.col("rn") <= RECALL_K)
        .select("qid", "vec_id")
    )
    approx = (
        pairs.withColumn("rn", pq_rn)
        .filter(F.col("rn") <= RECALL_K)
        .select("qid", "vec_id")
    )
    hits = brute.join(approx, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("h")
    )
    perq = q.select("qid").join(hits, "qid", "left").select(
        "qid", F.coalesce("h", F.lit(0)).alias("h")
    )
    return perq.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("h").cast("long").alias("sum_hits"),
        F.round(
            F.sum("h") / (F.lit(float(RECALL_K)) * F.count(F.lit(1))), 6
        ).alias("avg_recall_at_10"),
        F.sum(F.when(F.col("h") == RECALL_K, 1).otherwise(0))
        .cast("long")
        .alias("n_perfect"),
    )


def _pq_recall_oracle() -> str:
    from ..operators.similarity import PQ_QSCALE, pq_codebooks

    books = pq_codebooks()
    sub = len(books[0][0])
    dim = sub * len(books)
    qvec = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
        f"* {PQ_QSCALE}) AS BIGINT))"
    )
    cb_lists = []
    code_cols = []
    for s, codes in enumerate(books):
        lit = "[" + ", ".join(
            "[" + ", ".join(str(v) for v in c) + "]" for c in codes
        ) + "]"
        dl = "list_value(" + ", ".join(
            "(" + " + ".join(
                f"(qq[{s * sub + d + 1}] - {c[d]}) * (qq[{s * sub + d + 1}] - {c[d]})"
                for d in range(sub)
            ) + ")"
            for c in codes
        ) + ")"
        code_cols.append(f"list_position({dl}, list_min({dl})) AS c{s}")
        cb_lists.append(f"list_extract({lit}, c{s})")
    recon = f"flatten(list_value({', '.join(cb_lists)}))"
    l2 = (
        "list_sum(list_transform(generate_series(1, {n}), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, {qvec} AS qq FROM embeddings
    ),
    codes AS (SELECT vec_id, qq, {", ".join(code_cols)} FROM base),
    v AS (SELECT vec_id, qq, {recon} AS recon FROM codes),
    q AS (SELECT vec_id AS qid, qq AS qv FROM v
          WHERE vec_id % {RECALL_QUERY_MOD} = 0),
    pairs AS (
      SELECT q.qid, v.vec_id,
             CAST({l2.format(n=dim, a="v.qq", b="q.qv")} AS BIGINT) AS d_exact,
             CAST({l2.format(n=dim, a="v.recon", b="q.qv")} AS BIGINT) AS d_pq
      FROM v, q WHERE v.vec_id <> q.qid
    ),
    brute AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY d_exact, vec_id) AS rn
        FROM pairs
      ) r WHERE rn <= {RECALL_K}
    ),
    approx AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY d_pq, vec_id) AS rn
        FROM pairs
      ) r WHERE rn <= {RECALL_K}
    ),
    hits AS (
      SELECT b.qid, count(*) AS h
      FROM brute b JOIN approx a ON b.qid = a.qid AND b.vec_id = a.vec_id
      GROUP BY b.qid
    ),
    perq AS (
      SELECT q.qid, COALESCE(h, 0) AS h FROM q LEFT JOIN hits USING (qid)
    )
    SELECT count(*) AS n_queries,
           CAST(sum(h) AS BIGINT) AS sum_hits,
           ROUND(sum(h) / ({RECALL_K}.0 * count(*)), 6) AS avg_recall_at_10,
           CAST(sum(CASE WHEN h = {RECALL_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_perfect
    FROM perq
    """


def _finalize_pq_recall() -> None:
    from .queries import QUERIES

    qd = QUERIES["pq_recall_eval"]
    QUERIES["pq_recall_eval"] = type(qd)(
        fn=qd.fn,
        oracle=_pq_recall_oracle(),
        description="PQ evaluation harness: recall@10 of the "
        "PQ-reconstruction (ADC) ranking vs exact quantized-L2 brute "
        "force over the deterministic query sample — int64-exact "
        "cross-engine",
    )


_finalize_pq_recall()


@register(
    "bigram_ppl_filter",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}') AS ts
      FROM documents
    ),
    d2 AS (SELECT * FROM d WHERE len(ts) >= 2),
    bg AS (
      SELECT doc_id, lang,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)])   AS w2
      FROM d2
    ),
    train AS (SELECT w1, w2 FROM bg WHERE lang = 'en'),
    cb AS (SELECT w1, w2, count(*) AS c FROM train GROUP BY w1, w2),
    cu AS (SELECT w1, count(*) AS c FROM train GROUP BY w1),
    v  AS (SELECT count(DISTINCT w2) AS nv FROM train),
    sc AS (
      SELECT bg.doc_id, bg.lang,
             {_micronats_sql('CAST(2 * coalesce(cu.c, 0) + v.nv AS DOUBLE)')}
           - {_micronats_sql('CAST(2 * coalesce(cb.c, 0) + 1 AS DOUBLE)')}
               AS nll_micro
      FROM bg
      LEFT JOIN cb ON bg.w1 = cb.w1 AND bg.w2 = cb.w2
      LEFT JOIN cu ON bg.w1 = cu.w1
      CROSS JOIN v
    ),
    agg AS (
      SELECT doc_id, lang, count(*) AS n_bigrams,
             CAST(floor(CAST(sum(nll_micro) AS DOUBLE) / count(*)) AS BIGINT)
               AS nll_micro
      FROM sc GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_bigrams,
           ROUND(CAST(nll_micro AS DOUBLE) / 1000000, 6) AS avg_nll,
           CASE ntile(3) OVER (ORDER BY nll_micro, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS ppl_bucket
    FROM agg
    """,
    "CCNet-style conditional-LM perplexity filter: a word-bigram LM with "
    "add-1/2 smoothing trained on the reference subset (lang='en') scores "
    "EVERY document's mean negative log-likelihood, and docs split into "
    "head/middle/tail terciles — the classic crawl-quality cut "
    "(out-of-domain languages land in the tail). Integer micro-nat "
    "arithmetic end-to-end: (2c+1)/(2c'+V) keeps ln() on exact integer "
    "doubles, so buckets are bit-equal across engines.",
)
def bigram_ppl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train & score in one pass structure:

    1. tokenize once, keep docs with >= 2 tokens, explode adjacent pairs
       (``slice``+``arrays_zip`` — JVM codegen, no Python boundary);
    2. the LM = two map-side-combined aggregates over the 'en' subset
       (bigram counts, predecessor counts) + a 1-row vocab scalar;
    3. every doc's bigrams LEFT-join the broadcast LM tables and the
       per-bigram NLL sums per doc (one shuffle on doc_id);
    4. terciles via one window over the per-DOC aggregate (corpus-sized
       input collapsed to one row per doc before the window; at 100 TB
       swap ntile for approx-percentile thresholds — the cut is the
       same, the window partition pressure vanishes).

    100 TB: the LM tables are vocab-bounded, not corpus-bounded — a real
    deployment prunes count<k tail bigrams before broadcast (KenLM does
    the same); the corpus-sized sides stream through broadcast hash
    joins with zero wide shuffles of text."""
    docs = _t(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    d2 = docs.select("doc_id", "lang", ts.alias("ts")).filter(
        F.size("ts") >= 2
    )
    n = F.size("ts")
    bg = d2.select(
        "doc_id",
        "lang",
        F.slice("ts", 1, n - 1).alias("a"),
        F.slice("ts", 2, n - 1).alias("b"),
    ).select(
        "doc_id",
        "lang",
        F.explode(F.arrays_zip(F.col("a"), F.col("b"))).alias("z"),
    ).select(
        "doc_id", "lang", F.col("z.a").alias("w1"), F.col("z.b").alias("w2")
    )
    bg.persist()
    train = bg.filter(F.col("lang") == "en").select("w1", "w2")
    cb = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = train.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    v = train.agg(F.countDistinct("w2").alias("nv"))
    sc = (
        bg.join(F.broadcast(cb), ["w1", "w2"], "left")
        .join(F.broadcast(cu), ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "lang",
            (
                _micronats_col(
                    (2 * F.coalesce(F.col("cu"), F.lit(0)) + F.col("nv")).cast("double")
                )
                - _micronats_col(
                    (2 * F.coalesce(F.col("cb"), F.lit(0)) + 1).cast("double")
                )
            ).alias("nll_micro"),
        )
    )
    agg = sc.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.floor(
            F.sum("nll_micro").cast("double") / F.count(F.lit(1))
        ).cast("long").alias("nll_micro"),
    )
    from pyspark.sql import Window as _W

    w = _W.orderBy("nll_micro", "doc_id")
    return agg.withColumn("__nt", F.ntile(3).over(w)).select(
        "doc_id",
        "lang",
        "n_bigrams",
        F.round(F.col("nll_micro").cast("double") / 1000000.0, 6).alias("avg_nll"),
        F.when(F.col("__nt") == 1, "head")
        .when(F.col("__nt") == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


@register(
    "corpus_datasheet",
    f"""
    WITH d AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}'))
               AS toks,
             md5(text) AS h
      FROM documents
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS docs,
             CAST(count(DISTINCT h) AS BIGINT) AS uniq,
             CAST(sum(n_chars) AS BIGINT) AS chars,
             CAST(sum(toks) AS BIGINT) AS tokens,
             CAST(floor(quantile_cont(toks, 0.5)) AS BIGINT) AS p50,
             CAST(floor(quantile_cont(toks, 0.9)) AS BIGINT) AS p90
      FROM d
    )
    SELECT 'corpus' AS section, 'docs' AS metric, docs AS value FROM tot
    UNION ALL
    SELECT 'corpus', 'exact_dup_docs', docs - uniq FROM tot
    UNION ALL
    SELECT 'corpus', 'chars', chars FROM tot
    UNION ALL
    SELECT 'corpus', 'tokens', tokens FROM tot
    UNION ALL
    SELECT 'corpus', 'tokens_p50', p50 FROM tot
    UNION ALL
    SELECT 'corpus', 'tokens_p90', p90 FROM tot
    UNION ALL
    SELECT 'lang:' || lang, 'docs', CAST(count(*) AS BIGINT)
    FROM d GROUP BY lang
    UNION ALL
    SELECT 'source:' || source, 'docs', CAST(count(*) AS BIGINT)
    FROM d GROUP BY source
    """,
    "Dataset datasheet / data card in one pass (Gebru et al. 2021 "
    "'Datasheets for Datasets'): corpus totals, exact-duplicate count, "
    "token-length percentiles, and per-language / per-source "
    "composition as one (section, metric, value) report — the artifact "
    "every training-data release ships. One tokenizing scan feeds a "
    "GROUPING-SETS-shaped rollup (lang and source composition share one "
    "shuffle) plus an exact-percentile aggregate; the duplicate count "
    "is count(*) - count(DISTINCT md5) — no pairwise anything.",
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)).alias("toks"),
        F.md5(F.col("text")).alias("h"),
    )
    d = d.persist()
    tot = d.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("h").alias("uniq"),
        F.sum("n_chars").alias("chars"),
        F.sum("toks").cast("long").alias("tokens"),
        F.floor(F.expr("percentile(toks, 0.5)")).cast("long").alias("p50"),
        F.floor(F.expr("percentile(toks, 0.9)")).cast("long").alias("p90"),
    )
    scalar_rows = tot.select(
        F.explode(
            F.array(
                F.struct(F.lit("docs").alias("metric"), F.col("docs").alias("value")),
                F.struct(F.lit("exact_dup_docs").alias("metric"),
                         (F.col("docs") - F.col("uniq")).alias("value")),
                F.struct(F.lit("chars").alias("metric"), F.col("chars").alias("value")),
                F.struct(F.lit("tokens").alias("metric"), F.col("tokens").alias("value")),
                F.struct(F.lit("tokens_p50").alias("metric"), F.col("p50").alias("value")),
                F.struct(F.lit("tokens_p90").alias("metric"), F.col("p90").alias("value")),
            )
        ).alias("kv")
    ).select(
        F.lit("corpus").alias("section"),
        F.col("kv.metric").alias("metric"),
        F.col("kv.value").cast("long").alias("value"),
    )
    # one shuffle for BOTH composition axes: grouping sets over (lang),
    # (source) — at 100 TB this is the map-side-combined rollup shape
    comp = d.groupingSets(
        [[F.col("lang")], [F.col("source")]], F.col("lang"), F.col("source")
    ).agg(F.count(F.lit(1)).cast("long").alias("value")).select(
        F.when(F.col("lang").isNotNull(), F.concat(F.lit("lang:"), F.col("lang")))
        .otherwise(F.concat(F.lit("source:"), F.col("source"))).alias("section"),
        F.lit("docs").alias("metric"),
        "value",
    )
    return scalar_rows.unionByName(comp)


@register(
    "rho_learnability_select",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}') AS ts
      FROM documents
    ),
    d2 AS (SELECT * FROM d WHERE len(ts) >= 2),
    bg AS (
      SELECT doc_id, lang,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)])   AS w2
      FROM d2
    ),
    tr AS (SELECT w1, w2 FROM bg WHERE lang = 'en' AND doc_id % 2 = 1),
    ho AS (SELECT w1, w2 FROM bg WHERE lang = 'en' AND doc_id % 2 = 0),
    cbt AS (SELECT w1, w2, count(*) AS c FROM tr GROUP BY w1, w2),
    cut AS (SELECT w1, count(*) AS c FROM tr GROUP BY w1),
    vt  AS (SELECT count(DISTINCT w2) AS nv FROM tr),
    cbr AS (SELECT w1, w2, count(*) AS c FROM ho GROUP BY w1, w2),
    cur AS (SELECT w1, count(*) AS c FROM ho GROUP BY w1),
    vr  AS (SELECT count(DISTINCT w2) AS nv FROM ho),
    sc AS (
      SELECT bg.doc_id, bg.lang,
             ({_micronats_sql('CAST(2 * coalesce(cut.c, 0) + vt.nv AS DOUBLE)')}
            - {_micronats_sql('CAST(2 * coalesce(cbt.c, 0) + 1 AS DOUBLE)')})
           - ({_micronats_sql('CAST(2 * coalesce(cur.c, 0) + vr.nv AS DOUBLE)')}
            - {_micronats_sql('CAST(2 * coalesce(cbr.c, 0) + 1 AS DOUBLE)')})
               AS gap_micro
      FROM bg
      LEFT JOIN cbt ON bg.w1 = cbt.w1 AND bg.w2 = cbt.w2
      LEFT JOIN cut ON bg.w1 = cut.w1
      LEFT JOIN cbr ON bg.w1 = cbr.w1 AND bg.w2 = cbr.w2
      LEFT JOIN cur ON bg.w1 = cur.w1
      CROSS JOIN vt CROSS JOIN vr
    ),
    agg AS (
      SELECT doc_id, lang, count(*) AS n_bigrams,
             CAST(floor(CAST(sum(gap_micro) AS DOUBLE) / count(*)) AS BIGINT)
               AS learn_micro
      FROM sc GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           learn_micro,
           CASE ntile(3) OVER (ORDER BY learn_micro DESC, doc_id)
                WHEN 1 THEN 'selected' WHEN 2 THEN 'middle'
                ELSE 'dropped' END AS rho_bucket
    FROM agg
    """,
    "RHO-loss learnability selection (Mindermann et al. 2022): score "
    "every document under TWO bigram LMs trained on disjoint halves of "
    "the 'en' subset (odd doc_ids = training model, even = holdout/"
    "irreducible-loss model); learnability = train NLL minus holdout "
    "NLL, and the top tercile is 'selected' — points the current model "
    "finds hard but a held-out model proves learnable, skipping both "
    "the already-learned and the unlearnable-noise tails. Integer "
    "micro-nats make the gap exact. 100 TB: both LM tables are "
    "vocab-bounded broadcasts over one tokenizing scan; per-doc "
    "reduction is one shuffle on doc_id; ntile swaps for approx "
    "thresholds at scale.",
)
def rho_learnability_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    d2 = docs.select("doc_id", "lang", ts.alias("ts")).filter(F.size("ts") >= 2)
    n = F.size("ts")
    bg = d2.select(
        "doc_id", "lang",
        F.slice("ts", 1, n - 1).alias("a"),
        F.slice("ts", 2, n - 1).alias("b"),
    ).select(
        "doc_id", "lang", F.explode(F.arrays_zip(F.col("a"), F.col("b"))).alias("z")
    ).select(
        "doc_id", "lang", F.col("z.a").alias("w1"), F.col("z.b").alias("w2")
    )
    bg.persist()
    en = bg.filter(F.col("lang") == "en")
    tr = en.filter(F.col("doc_id") % 2 == 1).select("w1", "w2")
    ho = en.filter(F.col("doc_id") % 2 == 0).select("w1", "w2")

    def lm(train, tag):
        cb = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias(f"cb_{tag}"))
        cu = train.groupBy("w1").agg(F.count(F.lit(1)).alias(f"cu_{tag}"))
        v = train.agg(F.countDistinct("w2").alias(f"nv_{tag}"))
        return cb, cu, v

    cbt, cut, vt = lm(tr, "t")
    cbr, cur, vr = lm(ho, "r")

    def nll(tag):
        return _micronats_col(
            (2 * F.coalesce(F.col(f"cu_{tag}"), F.lit(0)) + F.col(f"nv_{tag}")).cast("double")
        ) - _micronats_col(
            (2 * F.coalesce(F.col(f"cb_{tag}"), F.lit(0)) + 1).cast("double")
        )

    sc = (
        bg.join(F.broadcast(cbt), ["w1", "w2"], "left")
        .join(F.broadcast(cut), ["w1"], "left")
        .join(F.broadcast(cbr), ["w1", "w2"], "left")
        .join(F.broadcast(cur), ["w1"], "left")
        .crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(vr))
        .select("doc_id", "lang", (nll("t") - nll("r")).alias("gap_micro"))
    )
    agg = sc.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(F.sum("gap_micro").cast("double") / F.count(F.lit(1)))
        .cast("long").alias("learn_micro"),
    )
    w = W.orderBy(F.col("learn_micro").desc(), "doc_id")
    return agg.withColumn("__nt", F.ntile(3).over(w)).select(
        "doc_id", "lang", "n_bigrams", "learn_micro",
        F.when(F.col("__nt") == 1, "selected")
        .when(F.col("__nt") == 2, "middle")
        .otherwise("dropped").alias("rho_bucket"),
    )


@register(
    "doremi_domain_weights",
    f"""
    WITH d AS (
      SELECT doc_id, lang, source,
             string_split_regex(trim(lower(text)), '{TOKEN_SPLIT}') AS ts
      FROM documents
    ),
    d2 AS (SELECT * FROM d WHERE len(ts) >= 2),
    bg AS (
      SELECT doc_id, lang, source,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)])   AS w2
      FROM d2
    ),
    tr AS (SELECT w1, w2 FROM bg WHERE lang = 'en' AND doc_id % 2 = 1),
    ho AS (SELECT w1, w2 FROM bg WHERE lang = 'en' AND doc_id % 2 = 0),
    cbt AS (SELECT w1, w2, count(*) AS c FROM tr GROUP BY w1, w2),
    cut AS (SELECT w1, count(*) AS c FROM tr GROUP BY w1),
    vt  AS (SELECT count(DISTINCT w2) AS nv FROM tr),
    cbr AS (SELECT w1, w2, count(*) AS c FROM ho GROUP BY w1, w2),
    cur AS (SELECT w1, count(*) AS c FROM ho GROUP BY w1),
    vr  AS (SELECT count(DISTINCT w2) AS nv FROM ho),
    sc AS (
      SELECT bg.source,
             ({_micronats_sql('CAST(2 * coalesce(cut.c, 0) + vt.nv AS DOUBLE)')}
            - {_micronats_sql('CAST(2 * coalesce(cbt.c, 0) + 1 AS DOUBLE)')})
           - ({_micronats_sql('CAST(2 * coalesce(cur.c, 0) + vr.nv AS DOUBLE)')}
            - {_micronats_sql('CAST(2 * coalesce(cbr.c, 0) + 1 AS DOUBLE)')})
               AS gap_micro
      FROM bg
      LEFT JOIN cbt ON bg.w1 = cbt.w1 AND bg.w2 = cbt.w2
      LEFT JOIN cut ON bg.w1 = cut.w1
      LEFT JOIN cbr ON bg.w1 = cbr.w1 AND bg.w2 = cbr.w2
      LEFT JOIN cur ON bg.w1 = cur.w1
      CROSS JOIN vt CROSS JOIN vr
    ),
    dom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(floor(CAST(sum(gap_micro) AS DOUBLE) / count(*)) AS BIGINT)
               AS excess_micro
      FROM sc GROUP BY source
    ),
    sm AS (
      SELECT source, n_bigrams, excess_micro,
             exp(CAST(excess_micro AS DOUBLE) / 1000000.0)
               / sum(exp(CAST(excess_micro AS DOUBLE) / 1000000.0)) OVER ()
               AS soft,
             CAST(count(*) OVER () AS DOUBLE) AS k
      FROM dom
    )
    SELECT source, n_bigrams, excess_micro,
           round(0.7 * soft + 0.3 / k, 6) AS weight
    FROM sm
    """,
    "DoReMi-style domain reweighting (Xie et al. 2023): per-SOURCE "
    "excess loss (proxy-model NLL minus reference-model NLL, reusing "
    "the two half-corpus bigram LMs) drives a softmax over domains, "
    "mixed 70/30 with uniform — domains the proxy finds hard but "
    "learnable get upweighted in the training mixture. Per-domain "
    "excess is exact (integer micro-nats); only the final softmax is "
    "floating point, rounded to 6 decimals on both engines. 100 TB: "
    "everything reduces map-side to one row per domain; the softmax is "
    "a window over #domains rows.",
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    d2 = docs.select("doc_id", "lang", "source", ts.alias("ts")).filter(
        F.size("ts") >= 2
    )
    n = F.size("ts")
    bg = d2.select(
        "doc_id", "lang", "source",
        F.slice("ts", 1, n - 1).alias("a"),
        F.slice("ts", 2, n - 1).alias("b"),
    ).select(
        "doc_id", "lang", "source",
        F.explode(F.arrays_zip(F.col("a"), F.col("b"))).alias("z"),
    ).select(
        "doc_id", "lang", "source",
        F.col("z.a").alias("w1"), F.col("z.b").alias("w2"),
    )
    bg.persist()
    en = bg.filter(F.col("lang") == "en")
    tr = en.filter(F.col("doc_id") % 2 == 1).select("w1", "w2")
    ho = en.filter(F.col("doc_id") % 2 == 0).select("w1", "w2")

    def lm(train, tag):
        cb = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias(f"cb_{tag}"))
        cu = train.groupBy("w1").agg(F.count(F.lit(1)).alias(f"cu_{tag}"))
        v = train.agg(F.countDistinct("w2").alias(f"nv_{tag}"))
        return cb, cu, v

    cbt, cut, vt = lm(tr, "t")
    cbr, cur, vr = lm(ho, "r")

    def nll(tag):
        return _micronats_col(
            (2 * F.coalesce(F.col(f"cu_{tag}"), F.lit(0)) + F.col(f"nv_{tag}")).cast("double")
        ) - _micronats_col(
            (2 * F.coalesce(F.col(f"cb_{tag}"), F.lit(0)) + 1).cast("double")
        )

    sc = (
        bg.join(F.broadcast(cbt), ["w1", "w2"], "left")
        .join(F.broadcast(cut), ["w1"], "left")
        .join(F.broadcast(cbr), ["w1", "w2"], "left")
        .join(F.broadcast(cur), ["w1"], "left")
        .crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(vr))
        .select("source", (nll("t") - nll("r")).alias("gap_micro"))
    )
    dom = sc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(F.sum("gap_micro").cast("double") / F.count(F.lit(1)))
        .cast("long").alias("excess_micro"),
    )
    wall = W.partitionBy()
    soft = F.exp(F.col("excess_micro").cast("double") / 1000000.0)
    return dom.select(
        "source", "n_bigrams", "excess_micro",
        F.round(
            0.7 * soft / F.sum(soft).over(wall)
            + 0.3 / F.count(F.lit(1)).over(wall).cast("double"),
            6,
        ).alias("weight"),
    )


MIXTURE_BUDGET = 200  # docs in the sampled training mixture


@register(
    "temperature_domain_mixture",
    f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT)
               AS w_units
      FROM documents GROUP BY source
    ),
    quotas AS (
      SELECT source, n_docs, w_units,
             CAST((w_units * {MIXTURE_BUDGET})
                  // (SELECT sum(w_units) FROM counts) AS BIGINT) AS quota
      FROM counts
    ),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
               AS rn
      FROM documents d
    )
    SELECT q.source, q.n_docs, q.quota,
           CAST(count(r.doc_id) AS BIGINT) AS selected,
           CAST(coalesce(sum(r.doc_id), 0) AS BIGINT) AS sum_doc_id
    FROM quotas q LEFT JOIN ranked r
      ON r.source = q.source AND r.rn <= q.quota
    GROUP BY q.source, q.n_docs, q.quota
    """,
    "Temperature-sampled domain mixture (T5/UniMax-style alpha=0.5 "
    "smoothing): per-source weights sqrt(n) flatten the head domains; "
    "integer weight-units (floor(sqrt(n)*1000)) and integer quota "
    "division keep both engines bit-identical (IEEE sqrt is correctly "
    "rounded, unlike pow); selection is the deterministic first "
    "quota docs per source by doc_id.",
)
def temperature_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: counts/quotas are one map-side-combined aggregate
    over 20 sources (broadcast back), selection is one per-source
    row_number window — the same two passes at any scale, and the
    selected set streams out without ever collecting. sqrt (not pow):
    IEEE-exact in every engine, so the integer weight units — and hence
    every quota — match the oracle bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).withColumn(
        "w_units",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000).cast("long"),
    )
    total_units = counts.agg(F.sum("w_units").alias("t"))
    quotas = counts.crossJoin(F.broadcast(total_units)).select(
        "source", "n_docs", "w_units",
        # integer floor division on BIGINT in BOTH engines (DuckDB //,
        # Spark DIV) — float division + cast disagrees between the two
        # (DuckDB CAST rounds, Spark cast truncates)
        F.expr(f"w_units * {MIXTURE_BUDGET} DIV t").alias("quota"),
    )
    ranked = docs.select(
        "source", "doc_id",
        F.row_number().over(
            W.partitionBy("source").orderBy("doc_id")
        ).alias("rn"),
    )
    # ONE pass over the ranked corpus: selection is a conditional
    # aggregate (rn <= quota), not a filter + re-join — every source
    # stays present (selected = 0 when quota is 0), and the documents
    # table scans 3× total (window + the two tiny count lineages)
    # instead of 5×
    picked = F.col("rn") <= F.col("quota")
    return (
        ranked.join(F.broadcast(quotas.select("source", "n_docs", "quota")),
                    on="source", how="inner")
        .groupBy("source", "n_docs", "quota")
        .agg(
            F.count(F.when(picked, F.lit(1))).cast("long").alias("selected"),
            F.coalesce(F.sum(F.when(picked, F.col("doc_id"))), F.lit(0))
            .cast("long").alias("sum_doc_id"),
        )
    )
