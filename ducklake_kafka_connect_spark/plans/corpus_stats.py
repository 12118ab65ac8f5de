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
from .queries import _t, register

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
