"""Perceptual-fingerprint, in-engine-training, and CDC-apply queries.

Round-9 wave of the beyond-parity surface (SURVEY §7 phase 5 / §2.G
extensions; the reference delegates all of this to DuckDB over the
tables it writes):

- ``image_phash_dedup``: DCT perceptual hash over a synthetic PNG
  corpus — real codec round trip + scale-invariance checked by the
  oracle's closed-form grouping.
- ``audio_dominant_freq``: PCM WAV synthesis → zero-dep decode → FFT
  dominant-bin analysis, oracle = generation arithmetic.
- ``quality_classifier_logreg``: a fastText-style document-quality
  classifier trained **inside the engine** — batch gradient descent
  where each iteration is one distributed aggregate (driver holds 4
  scalars, cost ∝ one scan per iteration); the DuckDB oracle unrolls
  the same three iterations as chained CTEs.
- ``cdc_upsert_tombstones``: CDC changelog apply through the lake
  MERGE with delete semantics (``tombstone_col``) — the
  `whenMatchedDelete` extension SURVEY §2.G calls out as absent in the
  reference (no DELETE anywhere in `src/main`;
  `connect/SinkRecordToArrowConverter.java:414-424` nulls the row
  instead of deleting).

All four keep the repo's determinism conventions: seeded-LCG synthetic
media, integer-exact invariants where possible, ROUND(.., k) on every
float output, aliases identical on both sides.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import LakeCatalog, LakeWriter
from .queries import _t, register

# ---------------------------------------------------------------------------
# image_phash_dedup
# ---------------------------------------------------------------------------

PHASH_MOD = 10  # one synthetic image per PHASH_MOD-th document
PHASH_GROUPS = 13  # distinct base rasters; ~4 images/group at sf0.01


@register(
    "image_phash_dedup",
    f"""
    WITH imgs AS (
      SELECT doc_id, (doc_id // {PHASH_MOD}) % {PHASH_GROUPS} AS grp
      FROM documents WHERE doc_id % {PHASH_MOD} = 0
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc,
           CAST(count(*) AS BIGINT) AS n_imgs,
           CAST(count(DISTINCT (doc_id // {PHASH_MOD}) % 2) AS BIGINT) AS n_scales
    FROM imgs GROUP BY grp HAVING count(*) >= 2
    """,
    "Image near-dup by DCT perceptual hash: synthetic PNGs (13 base "
    "rasters, alternating 32px and 64px pyramid variants) encoded and "
    "decoded through the zero-dep codec, pHashed in an Arrow-batched "
    "slot, grouped on the 63-bit fingerprint — scale invariance makes "
    "the groups match the generator's arithmetic exactly",
)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Python boundaries (synthesize+encode, decode+hash), both
    Arrow-batched mapInPandas over (media_id, data) frames; the groupBy
    shuffles one long per image. At 100 TB the same fingerprint keys the
    banded-LSH join in operators/dedup.py instead of an exact groupBy."""

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % PHASH_MOD == 0)
        .select("doc_id")
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.codecs import encode_png
        from ..operators.perceptual import synth_gray_image

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                grp = (d // PHASH_MOD) % PHASH_GROUPS
                scale = 1 + (d // PHASH_MOD) % 2
                img = synth_gray_image(seed=grp * 2654435761 + 11, scale=scale)
                payloads.append(encode_png(img[:, :, None]))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": payloads})

    media = docs.mapInPandas(synth, "media_id long, data binary")

    def hash_imgs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.codecs import decode_image_array
        from ..operators.perceptual import phash63

        for pdf in batches:
            hashes = [
                phash63(decode_image_array(bytes(p))) for p in pdf["data"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": hashes})

    hashed = media.mapInPandas(hash_imgs, "media_id long, phash long")
    return (
        hashed.groupBy("phash")
        .agg(
            F.min("media_id").alias("rep_doc"),
            F.count(F.lit(1)).alias("n_imgs"),
            F.countDistinct((F.col("media_id") / PHASH_MOD).cast("long") % 2)
            .alias("n_scales"),
        )
        .filter(F.col("n_imgs") >= 2)
        .select("rep_doc", "n_imgs", "n_scales")
    )


# ---------------------------------------------------------------------------
# audio_dominant_freq
# ---------------------------------------------------------------------------

AUDIO_N = 1024  # clip length (samples); integer-bin sines leak nothing
AUDIO_BINS = 37


@register(
    "audio_dominant_freq",
    f"""
    SELECT CAST(5 + doc_id % {AUDIO_BINS} AS BIGINT) AS dom_bin,
           CAST(count(*) AS BIGINT) AS n_clips
    FROM documents WHERE doc_id % 3 = 1
    GROUP BY 1
    """,
    "Audio spectral analysis e2e: synthetic int16 sine clips (bin = "
    "5 + doc_id % 37) through PCM WAV encode → zero-dep decode → numpy "
    "rfft dominant-bin argmax in an Arrow-batched slot; integer-bin "
    "sines make the dominant bin exact, so the oracle is the generator "
    "arithmetic",
)
def audio_dominant_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.codecs import encode_wav

        n = np.arange(AUDIO_N, dtype=np.float64)
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = 5 + int(doc_id) % AUDIO_BINS
                wave = np.round(
                    12000.0 * np.sin(2.0 * np.pi * k * n / AUDIO_N)
                ).astype(np.int16)
                payloads.append(encode_wav(wave, rate=16000))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": payloads})

    media = docs.mapInPandas(synth, "media_id long, data binary")

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.codecs import decode_wav
        from ..operators.perceptual import dominant_bin

        for pdf in batches:
            bins = []
            for p in pdf["data"]:
                samples, _rate = decode_wav(bytes(p))
                bins.append(dominant_bin(samples))
            yield pd.DataFrame({"media_id": pdf["media_id"], "dom_bin": bins})

    analyzed = media.mapInPandas(analyze, "media_id long, dom_bin long")
    return (
        analyzed.groupBy("dom_bin")
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select("dom_bin", "n_clips")
    )


# ---------------------------------------------------------------------------
# quality_classifier_logreg
# ---------------------------------------------------------------------------

LOGREG_ITERS = 3
LOGREG_LR = 1.0
# gradient / weight rounding keeps the iterate bit-identical across
# engines: double-sum reassociation noise (~1e-15) is far below the
# 5e-10 rounding boundary
LOGREG_ROUND = 9


def _logreg_feature_sql() -> str:
    """Shared feature definitions (DuckDB dialect; Spark mirrors them
    with identical arithmetic). y = 1 for English docs."""
    return """
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             length(text) / 500.0 AS x1,
             CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
               / length(text) AS x2,
             CAST(length(text) - length(replace(text, 'e', '')) AS DOUBLE)
               / length(text) AS x3
      FROM documents
    """


def _logreg_oracle() -> str:
    """Unrolled 3-iteration batch GD as chained CTEs. Iteration 1 is
    closed-form (w=0 → sigmoid=0.5); iterations 2-3 cross-join the
    1-row weight CTE."""
    feat = _logreg_feature_sql()
    r = LOGREG_ROUND
    lr = LOGREG_LR

    def step(prev: str, cur: str) -> str:
        z = f"({prev}.w0 + {prev}.w1*x1 + {prev}.w2*x2 + {prev}.w3*x3)"
        p = f"(1.0 / (1.0 + exp(-{z})))"
        return f"""
    {cur} AS (
      SELECT ROUND({prev}.w0 - {lr} * sum(({p} - y) * 1.0) / count(*), {r}) AS w0,
             ROUND({prev}.w1 - {lr} * sum(({p} - y) * x1) / count(*), {r}) AS w1,
             ROUND({prev}.w2 - {lr} * sum(({p} - y) * x2) / count(*), {r}) AS w2,
             ROUND({prev}.w3 - {lr} * sum(({p} - y) * x3) / count(*), {r}) AS w3
      FROM f CROSS JOIN {prev}
      GROUP BY {prev}.w0, {prev}.w1, {prev}.w2, {prev}.w3
    )"""

    return f"""
    WITH f AS ({feat}),
    w1 AS (
      SELECT ROUND(0.0 - {lr} * sum((0.5 - y) * 1.0) / count(*), {r}) AS w0,
             ROUND(0.0 - {lr} * sum((0.5 - y) * x1) / count(*), {r}) AS w1,
             ROUND(0.0 - {lr} * sum((0.5 - y) * x2) / count(*), {r}) AS w2,
             ROUND(0.0 - {lr} * sum((0.5 - y) * x3) / count(*), {r}) AS w3
      FROM f
    ),{step("w1", "w2")},{step("w2", "w3")}
    SELECT ROUND(w3.w0, 6) AS w0, ROUND(w3.w1, 6) AS w1,
           ROUND(w3.w2, 6) AS w2, ROUND(w3.w3, 6) AS w3,
           CAST(sum(CASE WHEN ((w3.w0 + w3.w1*x1 + w3.w2*x2 + w3.w3*x3) > 0)
                              = (y = 1.0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM f CROSS JOIN w3
    GROUP BY w3.w0, w3.w1, w3.w2, w3.w3
    """


@register(
    "quality_classifier_logreg",
    _logreg_oracle(),
    "In-engine quality-classifier training: 3 iterations of batch "
    "gradient descent for logistic regression (features: length, space "
    "ratio, 'e' ratio; label: lang='en'), each iteration one distributed "
    "aggregate — driver holds 4 scalars. Oracle unrolls the identical "
    "iterations as DuckDB CTEs; per-iteration ROUND pins the float path",
)
def quality_classifier_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fastText-shaped pipeline op (DCLM/FineWeb-style quality
    gating trains exactly such linear models over document features).
    Scale: each GD step is a map-side-combined agg over one scan —
    no shuffle growth with corpus size; the model (4 doubles) rides the
    closure. The bounded .first() per iteration is planning state, the
    same convention as kmeans_embedding_clusters (plans/pipeline.py)."""
    docs = _t(spark, sf_dir, "documents")
    ln = F.length("text").cast("double")
    feat = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (ln / 500.0).alias("x1"),
        ((ln - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))) / ln)
        .alias("x2"),
        ((ln - F.length(F.replace(F.col("text"), F.lit("e"), F.lit("")))) / ln)
        .alias("x3"),
    )

    w = [0.0, 0.0, 0.0, 0.0]
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    for _ in range(LOGREG_ITERS):
        z = F.lit(w[0]) + F.lit(w[1]) * xs[1] + F.lit(w[2]) * xs[2] + F.lit(w[3]) * xs[3]
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = feat.agg(
            *[F.sum((p - F.col("y")) * x).alias(f"g{j}") for j, x in enumerate(xs)],
            F.count(F.lit(1)).alias("n"),
        ).first()
        n = row["n"]
        w = [
            round(w[j] - LOGREG_LR * row[f"g{j}"] / n, LOGREG_ROUND)
            for j in range(4)
        ]

    score = F.lit(w[0]) + F.lit(w[1]) * xs[1] + F.lit(w[2]) * xs[2] + F.lit(w[3]) * xs[3]
    return feat.agg(
        F.round(F.lit(w[0]), 6).alias("w0"),
        F.round(F.lit(w[1]), 6).alias("w1"),
        F.round(F.lit(w[2]), 6).alias("w2"),
        F.round(F.lit(w[3]), 6).alias("w3"),
        F.sum(
            F.when((score > 0) == (F.col("y") == 1.0), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# training_pipeline_e2e
# ---------------------------------------------------------------------------

PIPE_SAMPLE_GATE = 600_000_000  # 60% content-stable hash gate


def _pipe_oracle() -> str:
    from ..operators.dedup import WORDS_SQL, h60_sql
    from ..operators.text import normalize_text_sql, quality_keep_sql

    words = WORDS_SQL.format(text="text")
    nh = h60_sql(normalize_text_sql("text"))
    gate = h60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH base AS (
      SELECT doc_id, lang,
             CASE WHEN {quality_keep_sql("text")} THEN 1 ELSE 0 END AS q,
             CAST(len({words}) AS BIGINT) AS tokens,
             {nh} AS h,
             CASE WHEN {gate} % 1000000000 < {PIPE_SAMPLE_GATE}
                  THEN 1 ELSE 0 END AS gate_ok
      FROM documents
    ),
    kept AS (
      SELECT lang, tokens, gate_ok,
             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM base WHERE q = 1
    ),
    a1 AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_input,
             CAST(sum(q) AS BIGINT) AS n_quality
      FROM base GROUP BY lang
    ),
    a2 AS (
      SELECT lang,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dedup,
             CAST(sum(CASE WHEN rn = 1 AND gate_ok = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_sampled,
             CAST(sum(CASE WHEN rn = 1 AND gate_ok = 1 THEN tokens ELSE 0 END)
                  AS BIGINT) AS sum_tokens
      FROM kept GROUP BY lang
    )
    SELECT a1.lang, n_input, n_quality, n_dedup, n_sampled, sum_tokens
    FROM a1 JOIN a2 ON a1.lang = a2.lang
    """


@register(
    "training_pipeline_e2e",
    _pipe_oracle(),
    "The whole training-data pipeline as ONE query: Gopher-style "
    "quality gate -> exact dedup keep-first on normalized text -> "
    "content-stable 60% hash sampling -> per-language doc/token "
    "accounting at every stage. Composes the production stages "
    "(corpus_quality_filter, dedup_keep_first, mixture gates) into a "
    "single two-aggregate plan",
)
def training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one corpus scan computes all per-doc flags inside
    whole-stage codegen; the only data-sized shuffle is the dedup
    window keyed by the 60-bit normalized-text hash (near-unique — no
    skew); both aggregates are map-side combined, the final join is
    5 rows. At 100 TB this is one wide pass plus one hash-partitioned
    window — the minimum any dedup-bearing pipeline can do."""
    from pyspark.sql import Window as W

    from ..operators.dedup import h60_col
    from ..operators.text import (
        normalize_text_col,
        quality_keep_col,
        token_count_col,
    )

    docs = _t(spark, sf_dir, "documents")
    # flags feed two aggregate branches (a1, kept); persist so the
    # regex-heavy per-doc pass runs once, parallel (the corpus parquet
    # is one file — same convention as containment_pairs)
    n_part = spark.sparkContext.defaultParallelism
    base = docs.repartition(n_part, "doc_id").select(
        "doc_id",
        "lang",
        F.when(quality_keep_col(F.col("text")), 1).otherwise(0).alias("q"),
        token_count_col(F.col("text")).cast("long").alias("tokens"),
        h60_col(normalize_text_col(F.col("text"))).alias("h"),
        F.when(
            h60_col(F.col("doc_id").cast("string")) % 1_000_000_000
            < PIPE_SAMPLE_GATE,
            1,
        )
        .otherwise(0)
        .alias("gate_ok"),
    ).persist()
    kept = (
        base.filter(F.col("q") == 1)
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("h").orderBy("doc_id")),
        )
    )
    a1 = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum("q").cast("long").alias("n_quality"),
    )
    a2 = kept.groupBy("lang").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dedup"),
        F.sum(F.when((F.col("rn") == 1) & (F.col("gate_ok") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
        F.sum(
            F.when(
                (F.col("rn") == 1) & (F.col("gate_ok") == 1), F.col("tokens")
            ).otherwise(0)
        )
        .cast("long")
        .alias("sum_tokens"),
    )
    return a1.join(a2, "lang").select(
        "lang", "n_input", "n_quality", "n_dedup", "n_sampled", "sum_tokens"
    )


# ---------------------------------------------------------------------------
# knn_label_eval
# ---------------------------------------------------------------------------

KNN_QUERY_MOD = 31  # deterministic query sample: vec_id % 31 == 0
KNN_K = 10
KNN_DIM = 64


def _knn_dot(a: str, b: str) -> str:
    """Array×array dot as an ``aggregate(zip_with(...))`` left-fold —
    bit-identical to the oracle's unrolled left-assoc chain (the fold
    seeds ``0.0 + t0 == t0`` and adds in the same order over the same
    doubles) but a LOOP in whole-stage codegen instead of 64 inlined
    terms. r14 (guide §7.2, same fix as the matryoshka/BFS harnesses):
    the unrolled spelling emitted a huge codegen method whose JIT'd
    form still ran the broadcast-NLJ pairs stage at 1.7 s warm; the
    fold runs it at 1.0 s and cuts the cold-compile wall 5.0 → 1.5 s.
    The CONSTANT-plane dots keep ``similarity._dot_sql``'s unroll (the
    fold there is interpreted per element with no loop win — measured
    rationale in that docstring)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _knn_dot_ddb(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{j}] AS DOUBLE) * CAST({b}[{j}] AS DOUBLE)"
        for j in range(1, KNN_DIM + 1)
    )


def _knn_oracle() -> str:
    nrm_v = _knn_dot_ddb("embedding", "embedding")
    dot = _knn_dot_ddb("q.embedding", "c.embedding")
    return f"""
    WITH vn AS (
      SELECT vec_id, label, embedding, sqrt({nrm_v}) AS nrm FROM embeddings
    ),
    qn AS (SELECT * FROM vn WHERE vec_id % {KNN_QUERY_MOD} = 0),
    pairs AS (
      SELECT q.vec_id AS qid, q.label AS qlabel, c.vec_id AS cid,
             c.label AS clabel,
             ROUND(({dot}) / (q.nrm * c.nrm), 6) AS sim
      FROM qn q JOIN vn c ON c.vec_id <> q.vec_id
    ),
    top AS (
      SELECT * FROM (
        SELECT qid, qlabel, clabel, sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, cid ASC) AS rn
        FROM pairs
      ) WHERE rn <= {KNN_K}
    ),
    votes AS (
      SELECT qid, qlabel, clabel, count(*) AS cnt
      FROM top GROUP BY qid, qlabel, clabel
    ),
    winner AS (
      SELECT qid, qlabel, clabel AS pred FROM (
        SELECT qid, qlabel, clabel, cnt,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cnt DESC, clabel ASC) AS rk
        FROM votes
      ) WHERE rk = 1
    )
    SELECT CAST(qlabel AS INT) AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct
    FROM winner GROUP BY 1
    """


@register(
    "knn_label_eval",
    _knn_oracle(),
    "kNN classification eval: sampled query vectors classified by the "
    "majority label of their 10 cosine-nearest neighbors (self "
    "excluded, deterministic tie-breaks) — per-label accuracy counts; "
    "the classifier-eval complement of ann_recall_eval, bit-identical "
    "cosines via the unrolled left-assoc dot convention",
)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the corpus never shuffles — the sampled query set
    broadcasts into a nested-loop join (1/31 of rows), the top-k window
    partitions by query id. At 100 TB classification eval always runs
    on a sampled query set like this; the production serving path is
    the IVF-PQ index (ann_ivfpq_topk), this is its accuracy harness."""
    from pyspark.sql import Window as W

    emb = _t(spark, sf_dir, "embeddings")
    # the corpus parquet is one file — the broadcast-NLJ product must
    # not evaluate 800k 64-term dots on a single task
    n_part = spark.sparkContext.defaultParallelism
    vn = emb.repartition(n_part, "vec_id").select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        F.sqrt(F.expr(_knn_dot("embedding", "embedding"))).alias("nrm"),
    )
    qn = (
        vn.filter(F.col("vec_id") % KNN_QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    pairs = F.broadcast(qn).join(
        vn, F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "qlabel",
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.round(
            F.expr(_knn_dot("qv", "v")) / (F.col("qnrm") * F.col("nrm")), 6
        ).alias("sim"),
    )
    top = (
        pairs.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(
                    F.col("sim").desc(), F.col("cid").asc()
                )
            ),
        )
        .filter(F.col("rn") <= KNN_K)
    )
    votes = top.groupBy("qid", "qlabel", "clabel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    winner = (
        votes.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(
                    F.col("cnt").desc(), F.col("clabel").asc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("qid", "qlabel", F.col("clabel").alias("pred"))
    )
    return winner.groupBy(F.col("qlabel").cast("int").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("pred") == F.col("qlabel"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )


# ---------------------------------------------------------------------------
# variant_shred_extract (Spark 4 VARIANT semi-structured path)
# ---------------------------------------------------------------------------


@register(
    "variant_shred_extract",
    """
    WITH j AS (
      SELECT json_object(
               'et', event_type,
               'tags', json_array(user_id % 5, event_id % 7),
               'meta', json_object('k', CAST(json_extract_string(props, '$.k')
                                             AS BIGINT),
                                   'v', ROUND(value, 3))
             ) AS doc
      FROM events
    )
    SELECT CAST(json_extract_string(doc, '$.et') AS VARCHAR) AS et,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(doc, '$.tags[1]') AS BIGINT)) AS BIGINT)
             AS sum_tag1,
           CAST(sum(CAST(json_extract(doc, '$.meta.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           ROUND(sum(CAST(json_extract(doc, '$.meta.v') AS DOUBLE)), 2)
             AS sum_v
    FROM j GROUP BY 1
    """,
    "Spark 4 VARIANT semi-structured pipeline: nested JSON docs parsed "
    "with parse_json into VARIANT, typed path extraction via "
    "variant_get (array index + nested object) — the open-schema "
    "ingestion path that skips full shredding; oracle = DuckDB "
    "json_extract over identically constructed docs",
)
def variant_shred_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-parity: the reference stores complex values as JSON text
    (B9, `DucklakeTableManager.java:419-423`); VARIANT is the Spark-4
    evolution of that storage decision — binary semi-structured
    encoding with typed lazy extraction, no per-query from_json schema.
    Plan: one scan, row-local parse+extract inside codegen'd project,
    tiny groupBy. ROUND(value,3) inside the doc pins float-to-JSON
    formatting drift out of the comparison."""
    ev = _t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.array(
                (F.col("user_id") % 5).cast("long"),
                (F.col("event_id") % 7).cast("long"),
            ).alias("tags"),
            F.struct(
                F.get_json_object("props", "$.k").cast("long").alias("k"),
                F.round(F.col("value"), 3).alias("v"),
            ).alias("meta"),
        )
    )
    v = ev.select(F.parse_json(doc).alias("v"))
    return (
        v.select(
            F.variant_get("v", "$.et", "string").alias("et"),
            F.variant_get("v", "$.tags[1]", "bigint").alias("tag1"),
            F.variant_get("v", "$.meta.k", "bigint").alias("k"),
            F.variant_get("v", "$.meta.v", "double").alias("val"),
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("tag1").alias("sum_tag1"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum("val"), 2).alias("sum_v"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_containment_pairs
# ---------------------------------------------------------------------------


def _containment_oracle() -> str:
    from ..operators.dedup import containment_pairs_sql

    return containment_pairs_sql()


@register(
    "dedup_containment_pairs",
    _containment_oracle(),
    "Asymmetric n-gram containment |A∩B|/min(|A|,|B|) top-20 pairs — "
    "the doc-in-doc measure symmetric Jaccard dilutes; inverted-index "
    "self-join with a frequent-shingle df cap bounding candidates "
    "linearly, total-order ranking for a deterministic top-k",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs

    return containment_pairs(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# bpe_encode_tokens
# ---------------------------------------------------------------------------

# Fixed (pre-trained) merge table — ranks 1-6 of bpe_train_merges on the
# corpus; shipped-tokenizer semantics: training happens offline, apply
# happens in-pipeline. "m er" composes with rank-1 "e r", so ordered
# application matters and the query proves it's honored.
BPE_MERGES = ["e r", "i n", "o w", "o r", "s t", "m er"]


def _bpe_apply_sql(expr: str) -> str:
    """Chain the fixed merges over a spaced-symbol string (DuckDB
    dialect) — boundary-padded literal replace, leftmost
    non-overlapping, identical to the training re-segmentation."""
    out = f"' ' || {expr} || ' '"
    for pair in BPE_MERGES:
        merged = pair.replace(" ", "")
        out = f"replace({out}, ' {pair} ', ' {merged} ')"
    return f"trim({out})"


_BPE_ENC_SQL = _bpe_apply_sql(r"trim(regexp_replace(word, '(.)', '\1 ', 'g'))")


@register(
    "bpe_encode_tokens",
    f"""
    WITH w AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents
    ),
    enc AS (
      SELECT lang,
             {_BPE_ENC_SQL}
               AS st
      FROM w WHERE length(word) >= 1
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(1 + length(st) - length(replace(st, ' ', ''))) AS BIGINT)
             AS total_tokens,
           ROUND(sum(1 + length(st) - length(replace(st, ' ', '')))
                 / CAST(count(*) AS DOUBLE), 6) AS tokens_per_word
    FROM enc GROUP BY lang
    """,
    "Tokenizer APPLY (the other half of bpe_train_merges): encode every "
    "word with a fixed 6-merge BPE table in ranked order — all literal "
    "boundary-padded replaces inside whole-stage codegen, zero Python; "
    "per-language token counts must match the oracle's identical chain",
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear per-row transform (explode words → 6 chained replaces →
    length arithmetic) + a tiny-cardinality groupBy: the 100 TB shape
    for tokenizer throughput accounting. Merge application reuses the
    exact replace semantics bpe_train_merges pinned as bit-identical
    across engines."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    w = docs.select("lang", F.explode(words).alias("word")).filter(
        F.length("word") >= 1
    )
    st = F.trim(F.regexp_replace("word", "(.)", "$1 "))
    padded = F.concat(F.lit(" "), st, F.lit(" "))
    for pair in BPE_MERGES:
        merged = pair.replace(" ", "")
        padded = F.replace(padded, F.lit(f" {pair} "), F.lit(f" {merged} "))
    st = F.trim(padded)
    tokens = (
        F.lit(1) + F.length(st) - F.length(F.replace(st, F.lit(" "), F.lit("")))
    ).cast("long")
    return (
        w.select("lang", tokens.alias("tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("tokens").alias("total_tokens"),
            F.round(
                F.sum("tokens") / F.count(F.lit(1)).cast("double"), 6
            ).alias("tokens_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# embedding_pca_power
# ---------------------------------------------------------------------------

PCA_DIM = 64
PCA_ITERS = 3
PCA_ROUND = 9  # per-iteration vector rounding (same rationale as LOGREG_ROUND)


def _pca_oracle() -> str:
    """Power iteration in pure SQL: long-format (vec_id, idx, val)
    explode via a lateral range join, then per-iteration (dot, update,
    normalize+round) CTE triples. v0 = 1/sqrt(64) = 0.125 exactly."""
    steps = []
    prev = "v0"
    for it in range(1, PCA_ITERS + 1):
        steps.append(f"""
    d{it} AS (
      SELECT e.vec_id, sum(e.val * {prev}.v) AS dot
      FROM e JOIN {prev} ON e.idx = {prev}.idx GROUP BY e.vec_id
    ),
    u{it} AS (
      SELECT e.idx, sum(d{it}.dot * e.val) AS u
      FROM e JOIN d{it} ON e.vec_id = d{it}.vec_id GROUP BY e.idx
    ),
    v{it} AS (
      SELECT idx,
             ROUND(u / sqrt((SELECT sum(u * u) FROM u{it})), {PCA_ROUND}) AS v
      FROM u{it}
    )""")
        prev = f"v{it}"
    chain = ",".join(steps)
    return f"""
    WITH e AS (
      SELECT vec_id, i AS idx, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, range(1, {PCA_DIM + 1}) t(i)
    ),
    v0 AS (SELECT i AS idx, 0.125 AS v FROM range(1, {PCA_DIM + 1}) t(i)),
    {chain},
    df AS (
      SELECT e.vec_id, sum(e.val * {prev}.v) AS dot
      FROM e JOIN {prev} ON e.idx = {prev}.idx GROUP BY e.vec_id
    )
    SELECT ROUND((SELECT sum(dot * dot) FROM df)
                 / (SELECT count(*) FROM embeddings), 6) AS lambda1,
           ROUND((SELECT v FROM {prev} WHERE idx = 1), 6) AS v_0,
           ROUND((SELECT v FROM {prev} WHERE idx = 2), 6) AS v_1,
           ROUND((SELECT v FROM {prev} WHERE idx = 3), 6) AS v_2,
           ROUND((SELECT v FROM {prev} WHERE idx = 4), 6) AS v_3
    """


@register(
    "embedding_pca_power",
    _pca_oracle(),
    "Top principal direction of the embedding second-moment matrix via "
    "3 power iterations — each iteration one scan: unrolled codegen dot, "
    "then posexplode + 64-group partial-agg update; driver holds only "
    "the 64-vector. Oracle runs the identical iterations as long-format "
    "SQL joins; per-iteration ROUND pins the float path",
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative in-engine linear algebra, the kmeans/SRP convention
    (plans/pipeline.py): no explode, no shuffle of vectors — one scan
    per iteration with map-side-combined sums; the iterate (64 doubles)
    rides the closure as literals. Cost is iterations x one scan,
    independent of dimensionality tricks — the 100 TB shape."""
    import math

    emb = _t(spark, sf_dir, "embeddings").select("embedding").persist()

    def dot_expr(v: list[float]):
        terms = [
            f"CAST(embedding[{j}] AS DOUBLE) * {v[j]!r}" for j in range(PCA_DIM)
        ]
        return F.expr("(" + " + ".join(terms) + ")")

    v = [0.125] * PCA_DIM  # 1/sqrt(64), exact
    for _ in range(PCA_ITERS):
        # update step: posexplode AFTER the scalar dot, then a 64-group
        # agg — partial aggregation collapses each task's exploded rows
        # to 64 before the shuffle, and the plan stays ~600 nodes (one
        # unrolled dot) instead of 64 unrolled agg columns (a 40x
        # planning/codegen saving measured at sf0.1: 2.7 s → see below)
        rows = (
            emb.select(dot_expr(v).alias("dot"), "embedding")
            .select("dot", F.posexplode("embedding").alias("idx", "val"))
            .groupBy("idx")
            .agg(F.sum(F.col("dot") * F.col("val").cast("double")).alias("u"))
            .collect()
        )
        u = [0.0] * PCA_DIM
        for r in rows:
            u[r["idx"]] = r["u"]
        norm = math.sqrt(sum(x * x for x in u))
        v = [round(x / norm, PCA_ROUND) for x in u]

    dot = dot_expr(v)
    return emb.agg(
        F.round(F.sum(dot * dot) / F.count(F.lit(1)), 6).alias("lambda1"),
        F.round(F.lit(v[0]), 6).alias("v_0"),
        F.round(F.lit(v[1]), 6).alias("v_1"),
        F.round(F.lit(v[2]), 6).alias("v_2"),
        F.round(F.lit(v[3]), 6).alias("v_3"),
    )


# ---------------------------------------------------------------------------
# cdc_upsert_tombstones
# ---------------------------------------------------------------------------


@register(
    "cdc_upsert_tombstones",
    """
    WITH last AS (
      SELECT user_id,
             arg_max(event_type, event_id) AS et,
             arg_max(value, event_id) AS v,
             max(event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_live,
           ROUND(sum(v), 2) AS sum_value,
           CAST(sum(seq) AS BIGINT) AS seq_sum
    FROM last WHERE et <> 'error'
    """,
    "CDC changelog apply with delete semantics: per-user base snapshot, "
    "then the whole event stream as a changelog MERGE (order_col=event "
    "sequence, tombstone_col=error events) — last-write-wins including "
    "winning tombstones deleting their key. The whenMatchedDelete "
    "extension over the reference's MERGE (SURVEY §2.G)",
)
def cdc_upsert_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the lake MERGE's tombstone path end-to-end (pytest
    covers it unit-level in test_tombstones.py; this adds the driver
    oracle). A user whose LAST event is an 'error' is tombstoned out of
    the final table; everyone else carries their latest event's payload."""
    ev = _t(spark, sf_dir, "events")
    base = (
        ev.groupBy("user_id")
        .agg(F.lit("base").alias("event_type"), F.lit(0.0).alias("value"),
             F.lit(0).cast("long").alias("seq"))
    )
    changelog = ev.select(
        "user_id",
        "event_type",
        "value",
        F.col("event_id").alias("seq"),
        (F.col("event_type") == "error").alias("_deleted"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_cdc_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("user_state"), pk=["user_id"])
    w.write(base)
    w.merge(changelog, order_col="seq", tombstone_col="_deleted")
    final = cat.table("user_state").read()
    return final.agg(
        F.count(F.lit(1)).alias("n_live"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.sum("seq").alias("seq_sum"),
    )
