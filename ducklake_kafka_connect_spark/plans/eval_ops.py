"""Round-9 wave: evaluation harnesses + pipeline diagnostics.

Five beyond-parity operators for the training-data pipeline surface
(SURVEY §2.G; the reference delegates all querying to DuckDB — these
extend the engine's dedup/retrieval family with the measurement and
diagnostic tooling a 100 TB corpus pipeline runs alongside it):

- ``minhash_calibration_curve`` — the LSH S-curve measured on real
  data: MinHash-estimated vs exact Jaccard on a deterministic sampled
  doc set, bucketed by exact J, with band-catch counts (the number the
  banding threshold choice rests on).
- ``hybrid_rrf_retrieval`` — reciprocal-rank fusion (Cormack et al.,
  SIGIR'09) of the BM25 sparse ranking and the dense cosine ranking.
- ``incremental_minhash_novelty`` — fuzzy novelty of an incoming batch
  probed against the standing corpus's LSH band index (the near-dup
  extension of ``incremental_dedup_new_batch``'s exact-hash check).
- ``dedup_span_maximal`` — ExactSubstr-style maximal duplicated spans
  (Lee et al. 2022): stride-1 rolling window hashes, cross-doc
  duplicated windows merged into maximal runs per document.
- ``key_skew_profile`` — hot-key diagnostics over the event stream
  (the number you read before choosing salting / AQE skew handling).

Determinism contract (same as plans/queries.py): all hashes derive
from md5, minhash-estimate micros are exact integers (matches·62500),
ratios integerize to micros before aggregation where ordering matters,
floats in outputs are ROUND(x, 6)/micro only.
"""

from __future__ import annotations

import math
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import dedup as dedup_ops
from ..operators.dedup import (
    BANDS,
    MAX_BUCKET,
    MERSENNE,
    NUM_PERM,
    ROWS_PER_BAND,
    WORDS_SQL,
    band_keys_col,
    band_keys_sql_exprs,
    h60_col,
    h60_sql,
    minhash_signatures,
    minhash_sigs_cte_sql,
    shingle_hash_set_col,
)
from ..operators.similarity import cosine_similarity_col
from .corpus_stats import _BM25_SCORED_CTES, bm25_scored
from .queries import QUERIES, _t, register

_SIG_NAMES = [f"s{i}" for i in range(NUM_PERM)]
# exact micro-units per matching signature component: 1e6 / NUM_PERM
_EST_MICRO_PER_MATCH = 1_000_000 // NUM_PERM


from ..operators.dedup import sig_matches_col as _sig_matches_col  # noqa: E402
from ..operators.dedup import sig_matches_sql as _sig_matches_sql  # noqa: E402
from ..lake.relation_cache import local_rows_df


def _band_hit_col(suffix_a: str = "_a", suffix_b: str = "_b") -> F.Column:
    hits = []
    for band in range(BANDS):
        rows = _SIG_NAMES[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
        hits.append(
            reduce(
                lambda x, y: x & y,
                [
                    F.col(f"{n}{suffix_a}") == F.col(f"{n}{suffix_b}")
                    for n in rows
                ],
            )
        )
    return reduce(lambda x, y: x | y, hits)


def _band_hit_sql(a: str = "a", b: str = "b") -> str:
    bands = []
    for band in range(BANDS):
        rows = _SIG_NAMES[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
        bands.append(
            "(" + " AND ".join(f"{a}.{n} = {b}.{n}" for n in rows) + ")"
        )
    return " OR ".join(bands)


# ---------------------------------------------------------------------------
# MinHash calibration curve
# ---------------------------------------------------------------------------

CAL_TARGET_DOCS = 250  # deterministic sample size target (mod-gated)
CAL_TRUTH_T = 0.7  # "true near-dup" threshold for the catch-rate columns

_CAL_JACC = (
    "ROUND(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)"
    " / (len(a.sh) + len(b.sh)"
    " - len(list_filter(a.sh, x -> list_contains(b.sh, x)))), 6)"
)


@register(
    "minhash_calibration_curve",
    f"""
    WITH kparam AS (
      SELECT GREATEST(1, CAST(CEIL(count(*) / {CAL_TARGET_DOCS}.0) AS BIGINT))
               AS k
      FROM documents
    ),
    {minhash_sigs_cte_sql(
        "(SELECT * FROM documents"
        " WHERE doc_id % (SELECT k FROM kparam) = 0)"
    )},
    side AS (SELECT s.*, b.sh FROM sigs s JOIN base b USING (id)),
    pairs AS (
      SELECT ({_sig_matches_sql()}) AS m,
             ({_band_hit_sql()}) AS bh,
             {_CAL_JACC} AS j
      FROM side a JOIN side b ON a.id < b.id
    )
    SELECT CAST(LEAST(FLOOR(j * 10), 9) AS INTEGER) AS j_bucket,
           count(*) AS n_pairs,
           CAST(ROUND(sum(m) * {_EST_MICRO_PER_MATCH}.0 / count(*)) AS BIGINT)
             AS avg_est_micro,
           CAST(sum(CASE WHEN bh THEN 1 ELSE 0 END) AS BIGINT) AS n_band_hit,
           CAST(sum(CASE WHEN j >= {CAL_TRUTH_T} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truth,
           CAST(sum(CASE WHEN bh AND j >= {CAL_TRUTH_T} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_caught
    FROM pairs GROUP BY j_bucket ORDER BY j_bucket
    """,
    "LSH threshold-calibration curve: MinHash-estimated vs exact "
    "Jaccard on a deterministic ~250-doc sample, bucketed by exact J "
    "— per bucket the avg estimate (integer micros, matches·62500), "
    "band-catch count, and catch rate at the 0.7 truth threshold; the "
    "empirical S-curve that justifies the (bands, rows) choice",
)
def minhash_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval protocol, 100 TB shape: ground truth (exact Jaccard) is the
    quadratic-cost side, so it runs on a FIXED-SIZE deterministic
    sample (doc_id mod gate targeting ~250 docs — the mod derives from
    the corpus count, so the pair budget is ~31k at any scale); the
    sampled side frame (signatures + shingle sets) persists once and
    self-joins broadcast. The estimate column costs 16 integer
    equality checks per pair; band_hit is the actual production catch
    predicate, so the curve measures the deployed pipeline, not a
    proxy."""
    docs = _t(spark, sf_dir, "documents")
    k = max(1, math.ceil(docs.count() / CAL_TARGET_DOCS))
    sample = docs.filter(F.col("doc_id") % k == 0)
    sigs = minhash_signatures(sample)
    sh = sample.select(
        "doc_id", shingle_hash_set_col(F.col("text")).alias("sh")
    )
    side = dedup_ops._persist(sigs.join(sh, "doc_id"))
    a = side.select(*[F.col(c).alias(f"{c}_a") for c in side.columns])
    b = side.select(*[F.col(c).alias(f"{c}_b") for c in side.columns])
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jacc = F.round(inter.cast("double") / union, 6)
    pairs = (
        a.join(F.broadcast(b), F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            _sig_matches_col().alias("m"),
            _band_hit_col().alias("bh"),
            jacc.alias("j"),
        )
    )
    truth = F.col("j") >= CAL_TRUTH_T
    return (
        pairs.groupBy(
            F.least(F.floor(F.col("j") * 10), F.lit(9).cast("bigint"))
            .cast("int")
            .alias("j_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("m") * float(_EST_MICRO_PER_MATCH) / F.count(F.lit(1)), 0
            )
            .cast("long")
            .alias("avg_est_micro"),
            F.sum(F.col("bh").cast("int")).cast("long").alias("n_band_hit"),
            F.sum(truth.cast("int")).cast("long").alias("n_truth"),
            F.sum((truth & F.col("bh")).cast("int"))
            .cast("long")
            .alias("n_caught"),
        )
        .orderBy("j_bucket")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ⊕ dense cosine via reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60  # the canonical RRF damping constant
RRF_N = 50  # per-ranker candidate depth
HYBRID_TOP = 10


@register(
    "hybrid_rrf_retrieval",
    f"""
    WITH {_BM25_SCORED_CTES},
    bm AS (
      SELECT id, bm25_rank FROM (
        SELECT doc_id AS id,
               row_number() OVER (ORDER BY score_micro DESC, doc_id)
                 AS bm25_rank
        FROM scored) t
      WHERE bm25_rank <= {RRF_N}
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id = 0),
    cosm AS (
      SELECT vec_id AS id,
             CAST(ROUND(list_cosine_similarity(
                    CAST(e.embedding AS DOUBLE[]), (SELECT v FROM qv))
                  * 1000000) AS BIGINT) AS cos_micro
      FROM embeddings e WHERE vec_id <> 0
    ),
    cs AS (
      SELECT id, cos_rank FROM (
        SELECT id, row_number() OVER (ORDER BY cos_micro DESC, id)
                 AS cos_rank
        FROM cosm) t
      WHERE cos_rank <= {RRF_N}
    ),
    fused AS (
      SELECT COALESCE(bm.id, cs.id) AS id,
             COALESCE(bm25_rank, 0) AS bm25_rank,
             COALESCE(cos_rank, 0) AS cos_rank,
             (CASE WHEN bm25_rank IS NULL THEN 0
                   ELSE CAST(ROUND(1000000.0 / ({RRF_K} + bm25_rank))
                             AS BIGINT) END
              + CASE WHEN cos_rank IS NULL THEN 0
                     ELSE CAST(ROUND(1000000.0 / ({RRF_K} + cos_rank))
                               AS BIGINT) END) AS rrf_micro
      FROM bm FULL OUTER JOIN cs ON bm.id = cs.id
    )
    SELECT id, bm25_rank, cos_rank, rrf_micro
    FROM fused ORDER BY rrf_micro DESC, id LIMIT {HYBRID_TOP}
    """,
    f"Hybrid retrieval: reciprocal-rank fusion (k={RRF_K}) of the BM25 "
    f"sparse top-{RRF_N} and the dense cosine top-{RRF_N} (query = "
    "vec 0, doc_id/vec_id aligned) — per-list contributions integerize "
    "to micros (round(1e6/(k+rank))) so the fused ranking is "
    "integer-exact; absent ranks report 0",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both rankers reduce corpus-side before anything fuses: each side
    is an orderBy().limit(N) (TakeOrderedAndProject — per-partition
    partial top-k, no full sort) and the rank window then runs over N
    rows, not the corpus. Fusion is a full-outer join of two ≤N-row
    frames — driver-trivial at any corpus size; at 100 TB the cost is
    the two scans the rankers already pay (BM25's token shuffle, the
    dense side's embedding scan)."""
    scored = bm25_scored(spark, sf_dir)
    bm = (
        scored.orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(RRF_N)
        .withColumn(
            "bm25_rank",
            F.row_number().over(
                W.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            ),
        )
        .select(F.col("doc_id").alias("id"), "bm25_rank")
    )
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cosm = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("id"),
        F.round(cosine_similarity_col("embedding", qv) * 1000000.0, 0)
        .cast("long")
        .alias("cos_micro"),
    )
    cs = (
        cosm.orderBy(F.col("cos_micro").desc(), "id")
        .limit(RRF_N)
        .withColumn(
            "cos_rank",
            F.row_number().over(
                W.orderBy(F.col("cos_micro").desc(), F.col("id"))
            ),
        )
        .select("id", "cos_rank")
    )

    def contrib(col: str) -> F.Column:
        return F.when(F.col(col).isNull(), F.lit(0).cast("long")).otherwise(
            F.round(F.lit(1000000.0) / (F.lit(RRF_K) + F.col(col)), 0).cast(
                "long"
            )
        )

    fused = bm.join(cs, "id", "full_outer").select(
        "id",
        F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
        F.coalesce("cos_rank", F.lit(0)).alias("cos_rank"),
        (contrib("bm25_rank") + contrib("cos_rank")).alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "id").limit(HYBRID_TOP)


# ---------------------------------------------------------------------------
# Incremental MinHash novelty: batch probe against the standing band index
# ---------------------------------------------------------------------------

NOV_MOD = 10  # doc_id % 10 == 9 → the incoming batch
NOV_MATCH_MIN = 8  # ≥8/16 matching components ⇒ est. Jaccard ≥ 0.5


@register(
    "incremental_minhash_novelty",
    f"""
    WITH {minhash_sigs_cte_sql("documents")},
    csig AS (SELECT * FROM sigs WHERE id % {NOV_MOD} <> {NOV_MOD - 1}),
    bsig AS (SELECT * FROM sigs WHERE id % {NOV_MOD} = {NOV_MOD - 1}),
    cband0 AS (
      SELECT id AS cid, unnest([{", ".join(band_keys_sql_exprs())}])
               AS band_key
      FROM csig
    ),
    cband AS (
      SELECT cid, band_key FROM (
        SELECT cid, band_key,
               count(*) OVER (PARTITION BY band_key) AS bn
        FROM cband0) t
      WHERE bn <= {MAX_BUCKET}
    ),
    bband AS (
      SELECT id AS bid, unnest([{", ".join(band_keys_sql_exprs())}])
               AS band_key
      FROM bsig
    ),
    cand AS (SELECT DISTINCT bid, cid FROM bband JOIN cband USING (band_key)),
    scoredp AS (
      SELECT c.bid, ({_sig_matches_sql("a", "b")}) AS m
      FROM cand c
      JOIN bsig a ON a.id = c.bid
      JOIN csig b ON b.id = c.cid
    ),
    best AS (SELECT bid, max(m) AS best_m FROM scoredp GROUP BY bid),
    flags AS (
      SELECT d.lang,
             CASE WHEN b.best_m >= {NOV_MATCH_MIN} THEN 1 ELSE 0 END AS flg,
             CASE WHEN b.best_m >= {NOV_MATCH_MIN} THEN b.best_m
                  ELSE 0 END AS fm
      FROM documents d LEFT JOIN best b ON b.bid = d.doc_id
      WHERE d.doc_id % {NOV_MOD} = {NOV_MOD - 1}
    )
    SELECT lang,
           count(*) AS n_incoming,
           CAST(sum(flg) AS BIGINT) AS n_flagged,
           CAST(count(*) - sum(flg) AS BIGINT) AS n_novel,
           CAST(CASE WHEN sum(flg) = 0 THEN 0
                ELSE ROUND(sum(fm) * {_EST_MICRO_PER_MATCH}.0 / sum(flg))
                END AS BIGINT) AS avg_best_est_micro
    FROM flags GROUP BY lang ORDER BY lang
    """,
    "Fuzzy incremental dedup: the incoming batch (doc_id mod gate) "
    "probes the standing corpus's LSH band index; a batch doc is "
    "flagged when its best signature agreement is ≥8/16 components "
    "(est. Jaccard ≥ 0.5) — per-lang novelty accounting with the avg "
    "best-match estimate in exact integer micros",
)
def incremental_minhash_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing-index shape: corpus band keys are the persisted
    side (in production a lake table partitioned by band_key — 100 TB
    corpora keep this index hot precisely so ingest probes cost
    O(batch), never O(corpus)); the batch explodes its own band keys
    and hash-joins in. Signature agreement (16 integer equalities) is
    the verify step — no shingle sets or corpus text move. The bucket
    cap drops degenerate boilerplate bands on the corpus side exactly
    like the full LSH pipeline.

    Signatures compute over DISTINCT texts (md5 collapse, the same
    duplicate-skew guard as ``minhash_pair_stages`` layer 1) and fan
    back out through slim (doc_id, text-hash) joins — identical text ⇒
    identical signature, so the result matches the oracle's per-doc
    form while the explode→window→16-min-agg pipeline scales with
    distinct texts, not corpus rows (the regime a replicated 100 TB
    corpus actually hits)."""
    docs = _t(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % NOV_MOD == NOV_MOD - 1
    hashed = docs.select("doc_id", "lang", F.md5("text").alias("__th"))
    groups = docs.select(F.md5("text").alias("__th"), "text").groupBy(
        "__th"
    ).agg(F.first("text").alias("text"))
    rsigs = minhash_signatures(
        groups.select(F.col("__th").alias("doc_id"), "text"), "doc_id", "text"
    ).withColumnRenamed("doc_id", "__th")
    sigs = dedup_ops._persist(
        hashed.join(rsigs, "__th").select("doc_id", *_SIG_NAMES)
    )
    csig = sigs.filter(~is_batch)
    bsig = sigs.filter(is_batch)
    keys = band_keys_col([F.col(n) for n in _SIG_NAMES])
    cband = (
        csig.select(F.col("doc_id").alias("cid"), F.explode(keys).alias("band_key"))
        .withColumn("bn", F.count(F.lit(1)).over(W.partitionBy("band_key")))
        .filter(F.col("bn") <= MAX_BUCKET)
        .drop("bn")
    )
    bband = bsig.select(
        F.col("doc_id").alias("bid"), F.explode(keys).alias("band_key")
    )
    cand = bband.join(cband, "band_key").select("bid", "cid").distinct()
    scoredp = (
        cand.join(
            bsig.select(
                F.col("doc_id").alias("bid"),
                *[F.col(n).alias(f"{n}_a") for n in _SIG_NAMES],
            ),
            "bid",
        )
        .join(
            csig.select(
                F.col("doc_id").alias("cid"),
                *[F.col(n).alias(f"{n}_b") for n in _SIG_NAMES],
            ),
            "cid",
        )
        .select("bid", _sig_matches_col().alias("m"))
    )
    best = scoredp.groupBy("bid").agg(F.max("m").alias("best_m"))
    flags = (
        docs.filter(is_batch)
        .select(F.col("doc_id").alias("bid"), "lang")
        .join(best, "bid", "left")
        .select(
            "lang",
            F.when(F.col("best_m") >= NOV_MATCH_MIN, 1).otherwise(0).alias("flg"),
            F.when(F.col("best_m") >= NOV_MATCH_MIN, F.col("best_m"))
            .otherwise(0)
            .alias("fm"),
        )
    )
    n_flagged = F.sum("flg").cast("long")
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            n_flagged.alias("n_flagged"),
            (F.count(F.lit(1)) - F.sum("flg")).cast("long").alias("n_novel"),
            F.when(F.sum("flg") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.round(
                    F.sum("fm") * float(_EST_MICRO_PER_MATCH) / F.sum("flg"), 0
                ).cast("long")
            )
            .alias("avg_best_est_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Streaming novelty loop (lake-backed standing index, sequential batches)
# ---------------------------------------------------------------------------

NOV_STREAM_BATCHES = (7, 8, 9)  # doc_id % 10 ∈ these → three micro-batches


def _novelty_rows_ctes() -> str:
    """CTE chain producing ``rows_all`` — the oracle twin of
    ``streaming/novelty.py::novelty_sig_rows`` (banded rows for long
    docs, one t_<md5> sentinel row for short docs)."""
    sentinel = ", ".join(f"CAST(-1 AS BIGINT) AS {n}" for n in _SIG_NAMES)
    bands = ", ".join(str(b) for b in range(BANDS))
    keys = ", ".join(band_keys_sql_exprs())
    return f"""{minhash_sigs_cte_sql("documents")},
    longr AS (
      SELECT id, unnest([{bands}]) AS band, unnest([{keys}]) AS band_key,
             {", ".join(_SIG_NAMES)}
      FROM sigs
    ),
    shortr AS (
      SELECT b.id, {BANDS} AS band, 't_' || md5(d.text) AS band_key,
             {sentinel}
      FROM base b JOIN documents d ON d.doc_id = b.id
      WHERE len(b.shh) = 0
    ),
    rows_all AS (SELECT * FROM longr UNION ALL SELECT * FROM shortr)"""


def _novelty_stream_oracle() -> str:
    chain = [f"idx0 AS (SELECT * FROM rows_all WHERE id % {NOV_MOD} <= 6)"]
    for i, b in enumerate(NOV_STREAM_BATCHES):
        chain.append(
            f"""b{b} AS (SELECT * FROM rows_all WHERE id % {NOV_MOD} = {b}),
    flag{b} AS (
      SELECT DISTINCT p.id FROM b{b} p JOIN idx{i} c
        ON p.band_key = c.band_key
      WHERE ({_sig_matches_sql('p', 'c')}) >= {NOV_MATCH_MIN}
      UNION
      SELECT DISTINCT p.id FROM b{b} p JOIN b{b} q
        ON p.band_key = q.band_key AND q.id < p.id
      WHERE ({_sig_matches_sql('p', 'q')}) >= {NOV_MATCH_MIN}
    ),
    novel{b} AS (
      SELECT * FROM b{b} WHERE id NOT IN (SELECT id FROM flag{b})
    ),
    idx{i + 1} AS (SELECT * FROM idx{i} UNION ALL SELECT * FROM novel{b})"""
        )
    selects = " UNION ALL ".join(
        f"""SELECT {b} AS batch_id,
           (SELECT count(*) FROM documents WHERE doc_id % {NOV_MOD} = {b})
             AS n_incoming,
           (SELECT count(DISTINCT id) FROM novel{b}) AS n_novel"""
        for b in NOV_STREAM_BATCHES
    )
    return f"""
    WITH {_novelty_rows_ctes()},
    {", ".join(chain)}
    SELECT batch_id, n_incoming, n_novel,
           n_incoming - n_novel AS n_flagged
    FROM ({selects}) t ORDER BY batch_id
    """


@register(
    "streaming_novelty_dedup",
    None,  # finalized below (needs the chained-CTE builder)
    "",
)
def streaming_novelty_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL streaming loop, not a simulation: bootstraps the
    lake-backed band index from the standing corpus, then pushes three
    micro-batches through ``StreamingNoveltyDedup.process_batch`` —
    each probe sees the previous batches' accepted docs because their
    index rows were committed to the table (the state lives in the
    lake, exactly as a foreachBatch deployment would run it). The
    accounting scalars collected per batch are bounded (3 ints each).
    Redelivery safety (re-running a batch appends nothing) is pinned in
    tests/test_streaming_novelty.py."""
    import tempfile
    import uuid

    from ..streaming.novelty import StreamingNoveltyDedup, novelty_sig_rows

    docs = _t(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(), f"novelty_q_{uuid.uuid4().hex[:12]}"
    )
    ded = StreamingNoveltyDedup(
        spark, root, "idx", match_min=NOV_MATCH_MIN
    )
    # one signature pass over the whole table, sliced per batch — the
    # per-batch probe/append loop below is the real one; only the sig
    # computation is batched (production computes each batch's rows
    # once too, this just shares the corpus scan across the 4 slices)
    # r14 (guide §3.3/§5): localCheckpoint instead of persist — same
    # one-time materialization, but it also TRUNCATES the lineage, so
    # the ~10 per-batch frames built over these rows (probe, side,
    # anti-join, append) re-analyze a leaf instead of the full minhash
    # expression tree (~0.5 s of driver time per batch at 3 batches).
    # Recomputed from parquet on every invocation, exactly like persist.
    all_rows = novelty_sig_rows(docs).localCheckpoint()
    mod = F.col("doc_id") % NOV_MOD
    ded.writer.write(all_rows.filter(mod <= 6))
    # all three batches' incoming counts in ONE column-pruned aggregate
    # (was one count job per batch)
    n_in_by_batch = {
        int(r["b"]): int(r["n"])
        for r in docs.filter(mod.isin(list(NOV_STREAM_BATCHES)))
        .groupBy(mod.alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    acc = []
    for b in NOV_STREAM_BATCHES:
        batch = docs.filter(F.col("doc_id") % NOV_MOD == b)
        n_in = n_in_by_batch.get(b, 0)
        ded.process_batch(batch, rows=all_rows.filter(mod == b))
        n_novel = ded.last_batch_stats["n_novel"]
        acc.append((b, n_in, n_novel, n_in - n_novel))
    all_rows.unpersist()  # releases the checkpoint blocks
    return local_rows_df(spark, 
        acc, "batch_id int, n_incoming long, n_novel long, n_flagged long"
    )


def _finalize_novelty_stream() -> None:
    qd = QUERIES["streaming_novelty_dedup"]
    QUERIES["streaming_novelty_dedup"] = type(qd)(
        fn=qd.fn,
        oracle=_novelty_stream_oracle(),
        description="Streaming fuzzy-dedup loop driven end-to-end: "
        "lake-backed LSH band index bootstrapped from the corpus, three "
        "sequential micro-batches probed and appended (batch k sees "
        "batches <k's accepted docs) — per-batch novelty accounting; "
        "oracle replays the identical sequential semantics in chained "
        "CTEs",
    )


_finalize_novelty_stream()


# ---------------------------------------------------------------------------
# Maximal duplicated spans (ExactSubstr-style, stride-1 rolling windows)
# ---------------------------------------------------------------------------

MAXSPAN_K = 8  # rolling window width in words
# positional combiners for the window hash: P^j mod M, P = 1000003
_SPAN_CJ = [pow(1000003, j, MERSENNE) for j in range(MAXSPAN_K)]


def _span_wh_sql() -> str:
    terms = " + ".join(
        f"hw[i+{j}] * {_SPAN_CJ[j]} % {MERSENNE}" for j in range(MAXSPAN_K)
    )
    return f"({terms}) % {MERSENNE}"


@register(
    "dedup_span_maximal",
    f"""
    WITH split AS (
      SELECT doc_id, lang, {WORDS_SQL.format(text="text")} AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, lang,
             list_transform(w, x -> {h60_sql('x')} % {MERSENNE}) AS hw
      FROM split
    ),
    wins AS (
      SELECT doc_id, lang,
             unnest(generate_series(1, len(hw) - {MAXSPAN_K} + 1)) AS pos,
             unnest(list_transform(
               generate_series(1, len(hw) - {MAXSPAN_K} + 1),
               i -> {_span_wh_sql()})) AS wh
      FROM hashed
      WHERE len(hw) >= {MAXSPAN_K}
    ),
    dup AS (
      SELECT wh FROM (
        SELECT wh, count(DISTINCT doc_id) AS nd FROM wins GROUP BY wh) t
      WHERE nd >= 2
    ),
    marked AS (
      SELECT w.doc_id, w.lang, w.pos FROM wins w JOIN dup USING (wh)
    ),
    runs AS (
      SELECT doc_id, lang, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM marked
    ),
    spans AS (
      SELECT doc_id, lang, grp,
             count(*) + {MAXSPAN_K - 1} AS span_tokens
      FROM runs GROUP BY doc_id, lang, grp
    )
    SELECT lang,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with_dup,
           count(*) AS n_spans,
           CAST(sum(span_tokens) AS BIGINT) AS sum_span_tokens,
           CAST(max(span_tokens) AS BIGINT) AS max_span_tokens
    FROM spans GROUP BY lang ORDER BY lang
    """,
    f"ExactSubstr-style maximal duplicated spans: stride-1 rolling "
    f"{MAXSPAN_K}-word window hashes, windows duplicated across ≥2 docs "
    "merged into maximal per-doc runs (pos − row_number grouping) — "
    "per-lang span counts, total duplicated tokens, and the longest "
    "span (Lee et al. 2022's substring-dedup accounting)",
)
def dedup_span_maximal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-1 windows cost one row per token (the same explode scale
    every tokenization query pays); the window hash composes from
    per-word md5s with lead() — one md5 per WORD, no string building,
    all codegen. Two shuffles total: the duplicate-window groupBy
    (slim (hash, doc) rows) and the per-doc run window, which reuses
    the doc_id partitioning the lead() chain already established. The
    duplicated-hash set joins back by hash — at 100 TB its size tracks
    actual duplication, not corpus size. Unlike ``dedup_span_exact``
    (non-overlapping blocks), runs of overlapping duplicated windows
    merge into MAXIMAL spans, the paper-faithful accounting."""
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = (
        docs.repartition(n_part, "doc_id")
        .select("doc_id", "lang", F.posexplode(words).alias("pos", "w"))
        .select(
            "doc_id", "lang", "pos", (h60_col(F.col("w")) % MERSENNE).alias("h0")
        )
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("h0")] + [
        F.lead("h0", j).over(win).alias(f"h{j}") for j in range(1, MAXSPAN_K)
    ]
    led = tok.select("doc_id", "lang", "pos", *cols)
    wh = (
        reduce(
            lambda x, y: x + y,
            [
                (F.col(f"h{j}") if j else F.col("h0")) * F.lit(_SPAN_CJ[j])
                % MERSENNE
                for j in range(MAXSPAN_K)
            ],
        )
        % MERSENNE
    )
    wins = led.filter(F.col(f"h{MAXSPAN_K - 1}").isNotNull()).select(
        "doc_id", "lang", "pos", wh.alias("wh")
    )
    dup = (
        wins.groupBy("wh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wh")
    )
    marked = wins.join(dup, "wh").select("doc_id", "lang", "pos")
    grp = F.col("pos") - F.row_number().over(win)
    spans = (
        marked.withColumn("grp", grp)
        .groupBy("doc_id", "lang", "grp")
        .agg((F.count(F.lit(1)) + F.lit(MAXSPAN_K - 1)).alias("span_tokens"))
    )
    return (
        spans.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs_with_dup"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("sum_span_tokens"),
            F.max("span_tokens").cast("long").alias("max_span_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Hot-key skew diagnostics
# ---------------------------------------------------------------------------


@register(
    "key_skew_profile",
    """
    WITH per_key AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY event_type, user_id
    ),
    prof AS (
      SELECT event_type,
             count(*) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_events,
             max(n) AS max_key_n,
             ROUND(quantile_cont(n, 0.5), 6) AS p50_key_n,
             ROUND(quantile_cont(n, 0.99), 6) AS p99_key_n
      FROM per_key GROUP BY event_type
    )
    SELECT event_type, n_keys, n_events, max_key_n, p50_key_n, p99_key_n,
           CAST(ROUND(max_key_n * 1000000.0 / n_events) AS BIGINT)
             AS hot_share_micro,
           CAST(ROUND(CAST(max_key_n AS DOUBLE) * n_keys * 1000000.0
                      / n_events) AS BIGINT) AS skew_ratio_micro
    FROM prof ORDER BY event_type
    """,
    "Hot-key skew diagnostics per event type: per-key count "
    "distribution (max, p50, p99), the hottest key's share of rows, "
    "and max/avg skew ratio (both integer micros) — the pre-flight "
    "numbers for choosing salting / AQE skew-join handling",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregate: per-(type, key) counts shuffle once (fully
    map-side combinable), then a tiny per-type rollup over key counts —
    state ∝ distinct keys, never rows. This is the diagnostic run
    BEFORE a big keyed join/agg at 100 TB: skew_ratio_micro ≈ 1e6
    means uniform keys (plain hash shuffle is fine); a hot key showing
    up here is the signal to salt (``skewed_event_stats_salted``) or
    rely on AQE skew splitting."""
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    prof = per_key.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("n_events"),
        F.max("n").alias("max_key_n"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50_key_n"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99_key_n"),
    )
    return prof.select(
        "event_type",
        "n_keys",
        "n_events",
        "max_key_n",
        "p50_key_n",
        "p99_key_n",
        F.round(F.col("max_key_n") * 1000000.0 / F.col("n_events"), 0)
        .cast("long")
        .alias("hot_share_micro"),
        F.round(
            F.col("max_key_n").cast("double")
            * F.col("n_keys")
            * 1000000.0
            / F.col("n_events"),
            0,
        )
        .cast("long")
        .alias("skew_ratio_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Matryoshka (dimension-truncation) recall evaluation
# ---------------------------------------------------------------------------

MRL_DIMS = (8, 16, 32, 64)  # prefix dims; 64 = full precision (truth)
MRL_QUERY_MOD = 31
MRL_K = 10


def _mrl_dot(a: str, b: str, dim: int, base: int, hof: bool = False) -> str:
    if hof:
        return _mrl_fold(a, b, 0, dim)
    return " + ".join(
        f"CAST({a}[{j}] AS DOUBLE) * CAST({b}[{j}] AS DOUBLE)"
        for j in range(base, base + dim)
    )


def _mrl_seg(a: str, b: str, lo: int, hi: int, base: int, hof: bool = False) -> str:
    if hof:
        return _mrl_fold(a, b, lo, hi)
    return " + ".join(
        f"CAST({a}[{j}] AS DOUBLE) * CAST({b}[{j}] AS DOUBLE)"
        for j in range(base + lo, base + hi)
    )


def _mrl_fold(a: str, b: str, lo: int, hi: int) -> str:
    """Left-fold spelling of the same dot-product chain (r14, guide §1/
    §7.2): ``aggregate(zip_with(slice..))`` generates a LOOP instead of
    ``hi - lo`` inlined multiply terms. Bit-exactness: the fold computes
    ((((0 + t_lo) + t_lo+1) + ...) and ``0.0 + t`` is IEEE-identical to
    ``t``, so every partial sum matches the inlined left-assoc chain.
    Why: the inlined spelling made the pairs stage's whole-stage-codegen
    source so large that JANINO COMPILATION (~5 s), not execution
    (~0.5 s), dominated the query — and the compile re-ran on every
    fresh plan build. Spark-side only; the DuckDB oracle keeps the
    inlined chain, values stay bit-identical (verified on all three SF
    dirs)."""
    n = hi - lo
    return (
        f"aggregate(zip_with(slice({a}, {lo + 1}, {n}), "
        f"slice({b}, {lo + 1}, {n}), "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _mrl_sql(table: str, base: int, hof: bool = False, parallel: int = 0) -> str:
    """Shared SQL text (array base is the only dialect difference):
    per-prefix-dim cosine rankings vs the full-dim ranking, recall@K.
    Dots build INCREMENTALLY — d16 = d8 + (terms 8..15) — which is the
    same left-assoc chain (((t0+t1)+…)+t15), so values stay
    bit-identical across engines while each pair pays 64 multiplies,
    not 8+16+32+64."""
    nrm_cols = ", ".join(
        f"sqrt({_mrl_dot('embedding', 'embedding', d, base, hof)}) AS nrm{d}"
        for d in MRL_DIMS
    )
    # layered prefix dots over the pair rows (N² side): each layer adds
    # one segment on top of the previous prefix sum
    dims = list(MRL_DIMS)
    seg0 = _mrl_seg("q.embedding", "c.embedding", 0, dims[0], base, hof)
    layers = [
        f"""p{dims[0]} AS (
      SELECT {"/*+ BROADCAST(q) */" if parallel else ""} q.vec_id AS qid, c.vec_id AS cid,
             q.embedding AS qe, c.embedding AS ce,
             {', '.join(f'q.nrm{d} AS qn{d}, c.nrm{d} AS cn{d}' for d in dims)},
             ({seg0}) AS d{dims[0]}
      FROM qn q JOIN {"vnp" if parallel else "vn"} c ON c.vec_id <> q.vec_id
    )"""
    ]
    for prev, cur in zip(dims, dims[1:]):
        seg = _mrl_seg("qe", "ce", prev, cur, base, hof)
        layers.append(
            f"""p{cur} AS (
      SELECT *, d{prev} + {seg} AS d{cur} FROM p{prev}
    )"""
        )
    cos_cols = ", ".join(
        f"ROUND(d{d} / (qn{d} * cn{d}), 6) AS cos{d}" for d in dims
    )
    # four row_numbers over ONE qid partitioning (no 4x long stack, no
    # truth self-join): recall@K of dim d = |{rn_d<=K AND rn_full<=K}|
    rank_cols = ", ".join(
        f"row_number() OVER (PARTITION BY qid ORDER BY cos{d} DESC, cid ASC)"
        f" AS r{d}"
        for d in dims
    )
    full = dims[-1]
    hit_cols = ", ".join(
        f"CAST(sum(CASE WHEN r{d} <= {MRL_K} AND r{full} <= {MRL_K} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS h{d}"
        for d in dims
    )
    pick = (
        "CASE d.dim "
        + " ".join(f"WHEN {d} THEN h{d}" for d in dims[:-1])
        + f" ELSE h{full} END"
    )
    vals = ",".join(f"({d})" for d in dims)
    # r14 (guide §2.5 input skew): the corpus side arrives as ONE scan
    # partition at bench scale (single small parquet file), which ran
    # the whole N² pairs stage on one core. The Spark side spreads it
    # across the session's parallelism before the broadcast-nested-loop
    # join — a corpus-rows-sized shuffle (tiny next to the N² stage it
    # unlocks); the oracle text is unchanged.
    vnp = (
        f",\n    vnp AS (SELECT /*+ REPARTITION({parallel}) */ * FROM vn)" if parallel else ""
    )
    return f"""
    WITH vn AS (
      SELECT vec_id, embedding, {nrm_cols} FROM {table}
    ),
    qn AS (SELECT * FROM vn WHERE vec_id % {MRL_QUERY_MOD} = 0){vnp},
    {', '.join(layers)},
    pairs AS (
      SELECT qid, cid, {cos_cols} FROM p{dims[-1]}
    ),
    ranked AS (SELECT qid, cid, {rank_cols} FROM pairs),
    hits AS (SELECT qid, {hit_cols} FROM ranked GROUP BY qid)
    SELECT CAST(d.dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum({pick}) AS BIGINT) AS sum_hits,
           CAST(FLOOR(sum({pick}) * {1_000_000 // MRL_K}.0 / count(*))
                AS BIGINT) AS avg_recall_micro
    FROM hits CROSS JOIN (VALUES {vals}) AS d(dim)
    GROUP BY d.dim ORDER BY d.dim
    """


@register(
    "matryoshka_recall_eval",
    _mrl_sql("embeddings", 1),
    f"Matryoshka embedding eval: recall@{MRL_K} of cosine rankings at "
    f"prefix dims {MRL_DIMS[:-1]} against the full {MRL_DIMS[-1]}-dim "
    "ranking on a sampled query set — the dimension-vs-quality curve "
    "read before truncating stored vectors (Kusupati et al. 2022)",
)
def matryoshka_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One all-pairs block on the sampled query set computes all four
    prefix cosines in a single codegen pass; the four per-dim rankings
    are four row_number columns over ONE qid hash exchange (no 4-way
    long-format stack, no truth self-join — recall@K of dim d is just
    rn_d<=K AND rn_full<=K counted per query). Every CTE is referenced
    once, so Catalyst's inline-per-reference behavior never recomputes
    the N² join and the SAME SQL text serves both engines. At corpus
    scale the candidate side would route through the IVF/PQ index —
    this harness measures WHICH truncation is safe to serve."""
    view = "embeddings_mrl_src"
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView(view)
    return spark.sql(
        _mrl_sql(view, 0, hof=True,
                 parallel=spark.sparkContext.defaultParallelism)
    )


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance-feedback query expansion
# ---------------------------------------------------------------------------

RM3_FEEDBACK_DOCS = 5
RM3_EXPANSION_TERMS = 5
RM3_MIN_TERM_LEN = 3
RM3_TOP_K = 10

def _bm25_kernel_sql(tf_src: str) -> str:
    """The Okapi kernel over a (doc_id, w, tf) source CTE named
    ``{tf_src}`` — same constants and micro-nat integerization as
    ``_BM25_SCORED_CTES`` (k1=1.2, b=0.75)."""
    return f"""df2 AS (SELECT w, count(*) AS df FROM {tf_src} GROUP BY w),
    contrib2 AS (
      SELECT t.doc_id,
             CAST(ROUND(
               ln((CAST(s.n_docs AS DOUBLE) - df2.df + CAST(0.5 AS DOUBLE))
                  / (df2.df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
               * (t.tf * CAST(2.2 AS DOUBLE))
               / (t.tf + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * d.dl / s.avgdl))
               * 1000000) AS BIGINT) AS c_micro
      FROM {tf_src} t JOIN df2 ON t.w = df2.w
      JOIN dl d ON t.doc_id = d.doc_id, stats s
    ),
    scored2 AS (
      SELECT c.doc_id, d.lang,
             CAST(count(*) AS BIGINT) AS matched_terms,
             CAST(sum(c.c_micro) AS BIGINT) AS score_micro
      FROM contrib2 c JOIN dl d ON c.doc_id = d.doc_id
      GROUP BY c.doc_id, d.lang
    )"""


def _rm3_oracle() -> str:
    from .corpus_stats import BM25_TERMS

    seed_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
    seed_vals = ", ".join(f"('{t}')" for t in BM25_TERMS)
    return f"""
    WITH {_BM25_SCORED_CTES},
    fb AS (
      SELECT doc_id FROM scored
      ORDER BY score_micro DESC, doc_id LIMIT {RM3_FEEDBACK_DOCS}
    ),
    fbtok AS (
      SELECT t.doc_id, t.w FROM tok t JOIN fb ON t.doc_id = fb.doc_id
    ),
    fbw AS (
      SELECT f.w,
             CAST(sum(CAST(FLOOR(f.tf * 1000000.0 / d.dl) AS BIGINT))
                  AS BIGINT) AS weight_micro
      FROM (SELECT doc_id, w, count(*) AS tf FROM fbtok GROUP BY doc_id, w) f
      JOIN dl d ON f.doc_id = d.doc_id
      WHERE length(f.w) >= {RM3_MIN_TERM_LEN}
        AND f.w NOT IN ({seed_in})
      GROUP BY f.w
    ),
    expansion AS (
      SELECT w FROM fbw ORDER BY weight_micro DESC, w ASC
      LIMIT {RM3_EXPANSION_TERMS}
    ),
    terms2 AS (
      SELECT w FROM expansion
      UNION ALL
      SELECT * FROM (VALUES {seed_vals}) AS s(w)
    ),
    tf2 AS (
      SELECT t.doc_id, t.w, count(*) AS tf
      FROM tok t JOIN terms2 ON t.w = terms2.w
      GROUP BY t.doc_id, t.w
    ),
    {_bm25_kernel_sql("tf2")}
    SELECT doc_id, lang, matched_terms, score_micro
    FROM scored2 ORDER BY score_micro DESC, doc_id LIMIT {RM3_TOP_K}
    """


@register(
    "rm3_query_expansion",
    _rm3_oracle(),
    f"RM3 pseudo-relevance feedback: BM25 first pass → top-"
    f"{RM3_FEEDBACK_DOCS} feedback docs → RM1 expansion weights "
    f"(integerized tf/dl mass) → top-{RM3_EXPANSION_TERMS} expansion "
    "terms re-queried with the seed (Lavrenko & Croft 2001 / Abdul-"
    f"Jaleel 2004) — final top-{RM3_TOP_K} integer-exact",
)
def rm3_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus token frame is computed once and persisted (first
    pass, feedback mass, and the re-query all derive from it); the
    feedback set is {RM3_FEEDBACK_DOCS} rows and the expansion
    vocabulary {RM3_EXPANSION_TERMS}+seed terms, so the second pass is
    the SAME corpus-linear probe shape as the first — never a rescan
    per term. Expansion weights integerize per (term, doc) before the
    sum, keeping term selection exact in both engines."""
    from .corpus_stats import BM25_TERMS, _tokens, bm25_scored

    tok = _tokens(spark, sf_dir)
    tok.persist()
    dl = tok.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("dl"))
    dl.persist()
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    fb = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(RM3_FEEDBACK_DOCS)
        .select("doc_id")
    )
    fbtf = (
        tok.join(F.broadcast(fb), "doc_id")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    fbw = (
        fbtf.join(dl.select("doc_id", "dl"), "doc_id")
        .filter(
            (F.length("w") >= RM3_MIN_TERM_LEN) & (~F.col("w").isin(BM25_TERMS))
        )
        .select(
            "w",
            F.floor(F.col("tf") * F.lit(1000000.0) / F.col("dl"))
            .cast("long")
            .alias("wm"),
        )
        .groupBy("w")
        .agg(F.sum("wm").cast("long").alias("weight_micro"))
    )
    expansion = (
        fbw.orderBy(F.col("weight_micro").desc(), F.col("w").asc())
        .limit(RM3_EXPANSION_TERMS)
        .select("w")
    )
    seed = local_rows_df(spark, [(t,) for t in BM25_TERMS], "w string")
    terms2 = expansion.unionAll(seed)
    tf2 = (
        tok.join(F.broadcast(terms2), "w")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df2 = tf2.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
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
        tf2.join(F.broadcast(df2), "w")
        .join(dl.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tfnorm * 1000000.0, 0).cast("long").alias("c_micro"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
            F.sum("c_micro").cast("long").alias("score_micro"),
        )
        .join(dl.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "matched_terms", "score_micro")
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(RM3_TOP_K)
    )


# ---------------------------------------------------------------------------
# Retrieval quality metrics: nDCG@K + MRR over label relevance
# ---------------------------------------------------------------------------

NDCG_K = 10
# sparser query sample than the MRL harness: the metric is a mean over
# queries, and the all-pairs block is |Q| x N by construction — mod 97
# keeps the bench-time of the brute-force harness proportionate
NDCG_QUERY_MOD = 97


def _ndcg_gains() -> tuple[list[int], list[int]]:
    """Integer micro gains g(r)=round(1e6/log2(r+1)) for ranks 1..K and
    their cumulative sums (ideal DCG per relevant-count) — literal
    tables shared by both engines, so metric sums are pure integer
    arithmetic with no cross-engine float risk."""
    import math

    g = [round(1_000_000 / math.log2(r + 1)) for r in range(1, NDCG_K + 1)]
    c, acc = [], 0
    for x in g:
        acc += x
        c.append(acc)
    return g, c


def _retrieval_metrics_sql(
    table: str, base: int, hof: bool = False, parallel: int = 0
) -> str:
    """Shared SQL text (array base is the only dialect difference):
    brute-force cosine ranking per sampled query, binary relevance =
    same ``label``, per-label mean MRR + mean nDCG@K in micro units.
    ``hof``/``parallel`` are the Spark-side spellings (see _mrl_fold and
    the vnp note in _mrl_sql); the oracle text never sets them."""
    gains, cums = _ndcg_gains()
    dot_nn = _mrl_dot("embedding", "embedding", 64, base, hof)
    dot_qc = _mrl_dot("q.embedding", "c.embedding", 64, base, hof)
    gain_case = " ".join(
        f"WHEN {r + 1} THEN {g}" for r, g in enumerate(gains)
    )
    idcg_case = " ".join(
        f"WHEN {k + 1} THEN {c}" for k, c in enumerate(cums)
    )
    vnp = (
        f",\n    vnp AS (SELECT /*+ REPARTITION({parallel}) */ * FROM vn)"
        if parallel
        else ""
    )
    bhint = "/*+ BROADCAST(q) */" if parallel else ""
    cside = "vnp" if parallel else "vn"
    return f"""
    WITH vn AS (
      SELECT vec_id, label, embedding, sqrt({dot_nn}) AS nrm FROM {table}
    ),
    qn AS (SELECT * FROM vn WHERE vec_id % {NDCG_QUERY_MOD} = 0){vnp},
    pairs AS (
      SELECT {bhint} q.vec_id AS qid, q.label AS qlab,
             c.vec_id AS cid, c.label AS clab,
             ROUND(({dot_qc}) / (q.nrm * c.nrm), 6) AS cos
      FROM qn q JOIN {cside} c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT qid, qlab, cid, clab,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)
               AS rnk
      FROM pairs
    ),
    perq AS (
      SELECT qid, qlab,
             min(CASE WHEN clab = qlab THEN rnk END) AS first_rel,
             CAST(sum(CASE WHEN clab = qlab AND rnk <= {NDCG_K}
                      THEN CASE rnk {gain_case} ELSE 0 END
                      ELSE 0 END) AS BIGINT) AS dcg_micro,
             sum(CASE WHEN clab = qlab THEN 1 ELSE 0 END) AS n_rel
      FROM ranked GROUP BY qid, qlab
    ),
    scored AS (
      SELECT qid, qlab,
             CAST(FLOOR(1000000.0 / first_rel) AS BIGINT) AS rr_micro,
             CAST(FLOOR(dcg_micro * 1000000.0 /
                  (CASE CASE WHEN n_rel < {NDCG_K} THEN n_rel
                             ELSE {NDCG_K} END {idcg_case} END))
                  AS BIGINT) AS ndcg_micro
      FROM perq WHERE first_rel IS NOT NULL
    )
    SELECT CAST(qlab AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(FLOOR(CAST(sum(rr_micro) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_rr_micro,
           CAST(FLOOR(CAST(sum(ndcg_micro) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_ndcg_micro
    FROM scored GROUP BY qlab ORDER BY label
    """


@register(
    "retrieval_ndcg_mrr",
    _retrieval_metrics_sql("embeddings", 1),
    f"Retrieval-quality harness: nDCG@{NDCG_K} and MRR of brute-force "
    "cosine rankings against label relevance (same cluster = relevant), "
    "per label — the eval half of a retrieval/RAG pipeline. Gain tables "
    "are integer micro constants, so the metric aggregation is exact "
    "cross-engine; one SQL text serves both (array base is the only "
    "dialect difference).",
)
def retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One N×|Q| cosine block (the same all-pairs shape as the MRL
    harness — at corpus scale the candidate generator routes through
    the IVF/PQ index and this harness scores its output), one qid
    window for ranks, then pure integer gain lookups. No Python
    boundary, two exchanges (qid hash, label agg)."""
    view = "embeddings_ndcg_src"
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView(view)
    return spark.sql(
        _retrieval_metrics_sql(
            view, 0, hof=True,
            parallel=spark.sparkContext.defaultParallelism,
        )
    )
