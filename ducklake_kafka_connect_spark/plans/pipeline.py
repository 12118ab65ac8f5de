"""Training-data pipeline queries, round 5: change-data feed between
lake snapshots, token-budget sequence packing, temperature-based
multilingual sampling, and per-source dedup accounting.

Same conventions as plans/queries.py: every computed column aliased
identically in the Spark plan and the DuckDB oracle; doubles either
rounded or integerized per row before grouping so sums are exact and
order-insensitive.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .queries import _t, merge_upsert_build, register

# ---------------------------------------------------------------------------
# Deterministic quantized k-means (iterative algorithm demo)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_DIM = 64
KMEANS_QSCALE = 1000


def _kmeans_sql() -> str:
    """CTE-unrolled oracle: the same integer-quantized Lloyd iterations.
    All arithmetic is exact (quantized BIGINT coordinates; dot products
    < 2^53 so their DOUBLE representation is exact), so the two engines
    agree bit-for-bit with no rounding epsilon."""
    dq = "CAST(v.q AS DOUBLE[])"
    blocks = [
        f"""
    v AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {KMEANS_QSCALE}) AS BIGINT)
             ) AS q
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, q AS c FROM v WHERE vec_id < {KMEANS_K})"""
    ]
    for i in range(KMEANS_ITERS + 1):
        blocks.append(f"""
    a{i} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM (
          SELECT v.vec_id, c{i}.cid,
                 list_dot_product({dq}, {dq})
                 + list_dot_product(CAST(c{i}.c AS DOUBLE[]), CAST(c{i}.c AS DOUBLE[]))
                 - 2 * list_dot_product({dq}, CAST(c{i}.c AS DOUBLE[])) AS dist
          FROM v, c{i}
        ) d
      ) r WHERE rn = 1
    )""")
        if i < KMEANS_ITERS:
            blocks.append(f"""
    c{i + 1} AS (
      SELECT cid, list(cval ORDER BY d) AS c FROM (
        SELECT a{i}.cid, dims.d,
               CAST(floor(CAST(sum(v.q[d]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
        FROM a{i} JOIN v USING (vec_id),
             (SELECT unnest(generate_series(1, {KMEANS_DIM})) AS d) dims
        GROUP BY a{i}.cid, dims.d
      ) g GROUP BY cid
    )""")
    return (
        "WITH" + ",".join(blocks) + f"""
    SELECT cid, count(*) AS n_members,
           CAST(sum(dist) AS BIGINT) AS inertia
    FROM a{KMEANS_ITERS} GROUP BY cid
    """
    )


@register(
    "kmeans_embedding_clusters",
    _kmeans_sql(),
    f"Deterministic k-means over the embedding corpus: {KMEANS_ITERS} "
    f"Lloyd iterations on {KMEANS_QSCALE}x-quantized integer "
    "coordinates (exact arithmetic — no cross-engine float drift), "
    "k=8, min-id init; the clustering step of an embedding-space "
    "curation pipeline",
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textbook Spark k-means shape: centroids live on the DRIVER
    (k x dim integers — two bounded 8-row collects), assignment is a
    map-side expression over broadcast centroid literals (zero shuffle),
    and each centroid update is one posexplode + (cid, dim) aggregate.
    Quantized integer coordinates make every distance and every
    floor-divided mean exact, so assignments match the oracle without
    any tolerance. At 100 TB this is exactly MLlib's iteration
    structure: per-iteration cost is one scan + one small aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    from ..operators import dedup as _dedup_ops

    return _dedup_ops._memo_plan(emb, "kmeans", (), lambda: _kmeans_build(emb))


def _kmeans_build(emb: DataFrame) -> DataFrame:
    vecs = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KMEANS_QSCALE),
        ).alias("q"),
    ).persist()
    cents = {
        r["vec_id"]: list(r["q"])
        for r in vecs.filter(F.col("vec_id") < KMEANS_K).collect()
    }

    def assigned(cent_map: dict) -> DataFrame:
        cids = sorted(cent_map)
        cents_arr = F.array(
            *[F.array(*[F.lit(v) for v in cent_map[cid]]) for cid in cids]
        )
        cids_arr = F.array(*[F.lit(c).cast("long") for c in cids])
        # one transform over the centroid array — k aggregates share a
        # single codegen'd expression instead of k column-wide copies
        dists = F.transform(
            cents_arr,
            lambda c: F.aggregate(
                F.zip_with(F.col("q"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        df = vecs.select("vec_id", "q", dists.alias("ds"))
        best = F.array_min("ds")
        # array_position finds the FIRST minimum → ties break to the
        # lowest cid, matching the oracle's ORDER BY (dist, cid)
        pick = F.element_at(cids_arr, F.array_position("ds", best).cast("int"))
        return df.select("vec_id", "q", pick.alias("cid"), best.alias("dist"))

    for _ in range(KMEANS_ITERS):
        a = assigned(cents)
        # centroid update WITHOUT posexplode: 64 element-wise sums in ONE
        # aggregate node (partial-agg friendly, no 64x row blowup). Python
        # // is exact integer floor — same value as floor(sum/count) in
        # double for these magnitudes (< 2^53), minus the explode shuffle.
        sums = [
            F.sum(F.element_at("q", d + 1)).alias(f"s{d}")
            for d in range(KMEANS_DIM)
        ]
        rows = a.groupBy("cid").agg(F.count(F.lit(1)).alias("n"), *sums).collect()
        cents = {
            r["cid"]: [int(r[f"s{d}"]) // int(r["n"]) for d in range(KMEANS_DIM)]
            for r in rows
        }

    return (
        assigned(cents)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist").alias("inertia"),
        )
    )

# ---------------------------------------------------------------------------
# Skew-resistant aggregation (salted two-phase)
# ---------------------------------------------------------------------------


@register(
    "skewed_event_stats_salted",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           min(event_id) AS first_id,
           max(event_id) AS last_id
    FROM events
    GROUP BY event_type
    """,
    "Hot-key aggregation through the salted two-phase operator: 5 event "
    "types fan out over 16 salts before merging, so no reducer owns a "
    "whole key — results identical to the plain GROUP BY the oracle runs",
)
def skewed_event_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives operators/skew.py::salted_aggregate: partials on
    (event_type, salt), merge on event_type. The oracle is the PLAIN
    aggregate — proving the salt changes only the physical distribution.
    Values integerize to cents per row so the two-phase addition order
    cannot drift."""
    from ..operators.skew import salted_aggregate

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": ("count", "cents"),
            "value_cents": ("sum", "cents"),
            "first_id": ("min", "event_id"),
            "last_id": ("max", "event_id"),
        },
    )


# ---------------------------------------------------------------------------
# Snapshot change feed (CDC between two committed lake versions)
# ---------------------------------------------------------------------------


@register(
    "snapshot_diff_changefeed",
    """
    WITH v1 AS (
      SELECT event_id, value FROM events WHERE event_id % 10 < 8
    ),
    v2 AS (
      SELECT event_id,
             CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END AS value
      FROM events
    ),
    j AS (
      SELECT v1.event_id AS old_id, v2.event_id AS new_id,
             CAST(floor(v1.value * 100) AS BIGINT) AS oc,
             CAST(floor(v2.value * 100) AS BIGINT) AS nc
      FROM v1 FULL JOIN v2 ON v1.event_id = v2.event_id
    )
    SELECT CASE WHEN old_id IS NULL THEN 'insert'
                WHEN new_id IS NULL THEN 'delete'
                WHEN oc <> nc THEN 'update'
                ELSE 'unchanged' END AS change_type,
           count(*) AS n,
           CAST(sum(coalesce(nc, oc)) AS BIGINT) AS value_cents
    FROM j
    GROUP BY 1
    """,
    "Change-data feed between two lake snapshots: full-outer diff of a "
    "pre-merge and post-merge version of the same table, classified "
    "insert/update/delete/unchanged (the CDC read a downstream "
    "incremental consumer would run)",
)
def snapshot_diff_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as _dops

    src = _t(spark, sf_dir, "events")
    return _dops._memo_plan(
        src, "snapshot_diff", (), lambda: _build_snapshot_diff(spark, sf_dir)
    )


def _build_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the real write path twice (append → v1, MERGE → v2), then
    diffs the two committed versions via one full-outer join on the PK —
    both sides are manifest-versioned reads of the SAME catalog, proving
    immutable data files + manifest versioning give a usable change feed
    without any change-log machinery. Values compare as per-row floor
    cents (exact, order-free). At scale the join shuffles only
    (pk, cents) pairs, never payloads."""
    w, batch, cat = merge_upsert_build(spark, sf_dir)
    t = cat.table("events_merged")
    v1 = t.current_version()
    w.write(batch)  # MERGE → v1 + 1
    cents = lambda c: F.floor(c * 100).cast("long")  # noqa: E731
    old = t.read(version=v1).select(
        F.col("event_id").alias("old_id"), cents(F.col("value")).alias("oc")
    )
    new = t.read().select(
        F.col("event_id").alias("new_id"), cents(F.col("value")).alias("nc")
    )
    j = old.join(new, old.old_id == new.new_id, "full_outer")
    change = (
        F.when(F.col("old_id").isNull(), "insert")
        .when(F.col("new_id").isNull(), "delete")
        .when(F.col("oc") != F.col("nc"), "update")
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change_type"), F.coalesce("nc", "oc").alias("c"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("value_cents"))
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing
# ---------------------------------------------------------------------------

PACK_TOKEN_BUDGET = 2048


@register(
    "pack_sequences_token_budget",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT lang, n_tok,
             CAST(floor(CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tok AS DOUBLE)
                        / {PACK_TOKEN_BUDGET}) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT lang, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, pack_id
    """,
    "Token-budget sequence packing: documents packed into "
    f"~{PACK_TOKEN_BUDGET}-token training chunks per language shard via "
    "a running-sum boundary (the batch-construction step of an LLM "
    "pretraining pipeline)",
)
def pack_sequences_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit packing as ONE window pass: the running token sum per
    language shard assigns each document the pack its first token lands
    in — deterministic, no driver loop, and the shard (lang) is the
    parallel unit exactly as a real packer shards its corpus. One
    shuffle (the lang window); the aggregate reuses its partitioning."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    win = W.partitionBy("lang").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    packed = docs.select(
        "lang",
        n_tok.alias("n_tok"),
        F.floor(
            (F.sum(n_tok).over(win) - n_tok).cast("double") / PACK_TOKEN_BUDGET
        ).alias("pack_id"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Temperature (alpha) sampling weights for multilingual mixing
# ---------------------------------------------------------------------------

SAMPLE_BUDGET = 100_000


@register(
    "lang_temperature_sampling",
    f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z FROM counts)
    SELECT lang, n_docs,
           ROUND(sqrt(CAST(n_docs AS DOUBLE)) / z, 6) AS weight,
           CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) / z * {SAMPLE_BUDGET} + 0.5)
                AS BIGINT) AS expected_samples
    FROM counts, tot
    """,
    "Temperature-sampled language mix (alpha = 0.5): per-language "
    "sampling weights proportional to sqrt(doc count) and expected "
    "draws from a fixed budget — the multilingual rebalancing step of a "
    "pretraining data recipe",
)
def lang_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha = 0.5 on purpose: sqrt is IEEE-correctly-rounded, so both
    engines compute bit-identical weights (a pow(x, alpha) would differ
    in the last ulp between libm implementations). The normalizer is a
    1-row broadcast cross join — counts never leave the executors until
    the 5-row result."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"))
    wcol = F.sqrt(F.col("n_docs").cast("double")) / F.col("z")
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(wcol, 6).alias("weight"),
        F.floor(wcol * SAMPLE_BUDGET + 0.5).cast("long").alias("expected_samples"),
    )


# ---------------------------------------------------------------------------
# Per-source dedup accounting
# ---------------------------------------------------------------------------


@register(
    "source_dedup_accounting",
    """
    WITH hashed AS (
      SELECT source, octet_length(encode(text)) AS n_bytes,
             row_number() OVER (PARTITION BY source, md5(text) ORDER BY doc_id)
               AS rn
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(1.0 - CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*), 6) AS dup_rate,
           CAST(sum(CASE WHEN rn = 1 THEN n_bytes ELSE 0 END) AS BIGINT)
             AS kept_bytes
    FROM hashed
    GROUP BY source
    """,
    "Per-source dedup accounting: exact-duplicate rate and surviving "
    "bytes after keep-first dedup within each source (the crawl-source "
    "quality report of a corpus pipeline)",
)
def source_dedup_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup scoped per source, reported as source-level
    accounting. One shuffle on (source, text-hash) for the ranking
    window; the source rollup reuses the source prefix of that
    partitioning. Text never shuffles — the window runs on its md5."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    hashed = docs.select(
        "source",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        F.row_number().over(W.partitionBy("source", h).orderBy("doc_id")).alias("rn"),
    )
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
    return hashed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        kept.alias("n_kept"),
        F.round(1.0 - kept.cast("double") / F.count(F.lit(1)), 6).alias("dup_rate"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_bytes")).otherwise(0)).alias(
            "kept_bytes"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance from the CDC feed
# ---------------------------------------------------------------------------


@register(
    "incremental_agg_view",
    """
    WITH final AS (
      SELECT CASE WHEN event_id % 10 >= 5 THEN 'updated' ELSE event_type END
               AS event_type,
             CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END
               AS value
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM final
    GROUP BY event_type
    """,
    "Materialized aggregate maintained INCREMENTALLY from the CDC "
    "preimage/postimage feed between two lake versions — signed deltas "
    "folded into the v1 aggregate reproduce the full recompute the "
    "oracle runs, including rows that migrate between group keys",
)
def incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as _dops

    src = _t(spark, sf_dir, "events")
    return _dops._memo_plan(
        src, "incr_agg_view", (), lambda: _build_incremental_agg_view(spark, sf_dir)
    )


def _build_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB materialized-view story: after a MERGE touches a sliver
    of the table, refresh a per-group aggregate by folding the
    ``changes(preimages=True)`` feed into the previous aggregate instead
    of rescanning the corpus. Every feed row carries sign +1
    (insert/update_postimage) or -1 (delete/update_preimage); summing
    signed counts and signed cents per group handles group-key migration
    (the merge rewrites event_type to 'updated') with no special cases.
    Cost at scale: base aggregate is already materialized (here: the
    pinned-v1 read stands in for it), so the refresh reads only the
    churned files — cost proportional to the delta, not the table.
    Values integerize to floor-cents per row so base+delta addition is
    exact and order-free."""
    w, batch, cat = merge_upsert_build(spark, sf_dir)
    t = cat.table("events_merged")
    v1 = t.current_version()
    w.write(batch)  # MERGE → v1 + 1

    cents = F.floor(F.col("value") * 100).cast("long")
    base = (
        t.read(version=v1)
        .select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("vc"))
    )
    feed = t.changes(v1, preimages=True)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        feed.select("event_type", sign.alias("s"), cents.alias("c"))
        .groupBy("event_type")
        .agg(F.sum("s").alias("dn"), F.sum(F.col("s") * F.col("c")).alias("dvc"))
    )
    zero = F.lit(0).cast("long")
    merged = base.join(delta, "event_type", "full_outer").select(
        "event_type",
        (F.coalesce("n", zero) + F.coalesce("dn", zero)).alias("n_events"),
        (F.coalesce("vc", zero) + F.coalesce("dvc", zero)).alias("value_cents"),
    )
    return merged.filter(F.col("n_events") > 0)


# ---------------------------------------------------------------------------
# Overlapping document chunking (context-window preparation)
# ---------------------------------------------------------------------------

CHUNK_CHARS = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


@register(
    "chunk_documents_overlap",
    f"""
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_id,
           CAST(1 + k * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(length(substring(text, CAST(1 + k * {CHUNK_STRIDE} AS INTEGER),
                                 {CHUNK_CHARS})) AS BIGINT) AS chunk_chars,
           md5(substring(text, CAST(1 + k * {CHUNK_STRIDE} AS INTEGER),
                         {CHUNK_CHARS})) AS chunk_md5
    FROM documents,
         LATERAL unnest(generate_series(
           0,
           CAST(floor((greatest(length(text), 1) - 1) / {CHUNK_STRIDE})
                AS BIGINT)
         )) AS g(k)
    """,
    f"Sliding-window document chunking: {CHUNK_CHARS}-char chunks every "
    f"{CHUNK_STRIDE} chars ({CHUNK_CHARS - CHUNK_STRIDE}-char overlap) — "
    "the context-window preparation step before embedding or training; "
    "chunk text verified by md5 on both engines",
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure narrow transformation: sequence() builds the per-doc start
    offsets, transform() slices each window, posexplode flattens — one
    codegen'd stage, ZERO shuffles, output rows ~ len/stride per doc.
    At 100 TB chunking is embarrassingly parallel and this plan keeps it
    that way: no repartition, no Python boundary, ~1.3 output rows per
    input row at these parameters, and the md5 column means downstream
    exact-dedup of chunks needs no re-read of the text."""
    docs = _t(spark, sf_dir, "documents")
    windows = F.expr(
        f"transform(sequence(1, greatest(length(text), 1), {CHUNK_STRIDE}),"
        f" s -> struct(s AS start, substring(text, s, {CHUNK_CHARS}) AS chunk))"
    )
    return docs.select(
        "doc_id", F.posexplode(windows).alias("chunk_id", "c")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.start").cast("long").alias("chunk_start"),
        F.length("c.chunk").cast("long").alias("chunk_chars"),
        F.md5(F.col("c.chunk")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Window-function suite (sequencing / neighbors / tiles / running totals)
# ---------------------------------------------------------------------------


@register(
    "window_rank_suite",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER seq AS BIGINT) AS seq,
           cents,
           lag(cents) OVER seq  AS prev_cents,
           lead(cents) OVER seq AS next_cents,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY cents, o_orderkey) AS BIGINT)
             AS spend_quartile,
           CAST(sum(cents) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS running_cents
    FROM o
    WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "Analytic window suite per customer: order sequencing (row_number), "
    "neighbor access (lag/lead), spend quartiles (ntile), and running "
    "totals — the session-feature extraction shape, one shuffle on the "
    "partition key shared by all four window frames",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four analytic functions share the o_custkey partitioning, so
    the plan is ONE hash exchange followed by two sorts (the two frame
    orderings); no window re-shuffles. Cents integerization keeps
    running sums exact. At 100 TB window width = one customer's orders —
    bounded state per key, no skew risk on this key family."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    seq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tile = W.partitionBy("o_custkey").orderBy("cents", "o_orderkey")
    run = seq.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(seq).cast("long").alias("seq"),
        "cents",
        F.lag("cents").over(seq).alias("prev_cents"),
        F.lead("cents").over(seq).alias("next_cents"),
        F.ntile(4).over(tile).cast("long").alias("spend_quartile"),
        F.sum("cents").over(run).alias("running_cents"),
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (shuffle-free repeated joins)
# ---------------------------------------------------------------------------

N_BUCKETS = 8


def write_bucketed(df: DataFrame, key: str, name: str, path: str) -> None:
    """Bucketed + sorted parquet table via the session catalog: both the
    hash-bucket layout and per-file sort order are recorded in table
    metadata, so later equi-joins on ``key`` between two such tables
    need NO exchange and NO sort — the scan itself satisfies the join's
    distribution and ordering requirements."""
    (
        df.write.format("parquet")
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def bucketed_join_frames(spark: SparkSession, sf_dir: str):
    """Build-phase: bucket orders and customer on the join key; return
    (joined_df, plain_join_df) for plan/equivalence checks."""
    tag = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"ducklake_bkt_{tag}")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ot, ct = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    write_bucketed(orders, "o_custkey", ot, os.path.join(base, "orders"))
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey",
        ct, os.path.join(base, "customer"),
    )
    bo, bc = spark.table(ot), spark.table(ct)
    # hint("merge"): without it the planner broadcasts the small side at
    # test scale and never reads the bucket metadata; at 100 TB neither
    # side is broadcastable and SMJ-over-buckets is the real plan shape
    joined = bo.hint("merge").join(bc.hint("merge"), "o_custkey")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    return joined, plain


@register(
    "bucketed_colocated_join",
    """
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "Customer-orders revenue by market segment through BUCKETED tables: "
    "both sides pre-hashed into 8 buckets on the join key, so the join "
    "runs with zero exchanges — the co-location strategy for any join "
    "repeated often enough to amortize one bucketed write",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeated-join answer at 100 TB: shuffling a 100 TB fact for
    every join is the bottleneck; bucketing pays that shuffle ONCE at
    write time and every subsequent equi-join on the bucket key is
    exchange-free (scan → join). The build here is the one-time cost;
    the query plan over the bucketed tables contains no Exchange before
    the join (asserted in tests/test_bucketed.py). The final group-by
    aggregates 5 segments — its exchange moves 5 rows per partition.
    The one-time bucket build is memoized per source (repeat calls
    reuse the session's bucketed tables — the point of bucketing)."""
    from ..operators import dedup as dedup_ops

    src = _t(spark, sf_dir, "orders")

    def build() -> DataFrame:
        joined, _ = bucketed_join_frames(spark, sf_dir)
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )

    return dedup_ops._memo_plan(src, "bucketed_join", (), build)


# ---------------------------------------------------------------------------
# Sharded export accounting
# ---------------------------------------------------------------------------

N_EXPORT_SHARDS = 16


@register(
    "export_shard_accounting",
    f"""
    SELECT ({{h60}} % {N_EXPORT_SHARDS}) AS shard,
           count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS text_bytes,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY 1
    """.replace(
        "{h60}", "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    ),
    "Deterministic export sharding: content-stable shard id (60-bit md5 "
    "of the key mod 16) with per-shard row/byte/range accounting — the "
    "manifest a trainer reads before streaming the shard files",
)
def export_shard_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accounting half of lake/export.py: one hash-groupBy on the
    shard id (the identical expression the writer partitions by), no
    data movement beyond the 16-group aggregate. Shard stability means a
    re-export after upstream edits rewrites only shards whose membership
    changed — at 100 TB that is the difference between a nightly
    full-copy and a delta push."""
    from ..lake.export import shard_col

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "shard", shard_col(F.col("doc_id").cast("string"), N_EXPORT_SHARDS)
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length(F.encode(F.col("text"), "UTF-8"))).alias(
                "text_bytes"
            ),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# Mixture materialization: deterministic per-language sampling
# ---------------------------------------------------------------------------

MIX_FRACTION = 0.2  # sample budget = 20% of the corpus, rebalanced by alpha=0.5


@register(
    "mixture_sampled_corpus",
    f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z,
             CAST(sum(n_docs) AS DOUBLE) AS total FROM counts
    ),
    rates AS (
      SELECT lang, n_docs,
             CAST(floor(least(
               1.0,
               sqrt(CAST(n_docs AS DOUBLE)) / z * (total * {MIX_FRACTION})
                 / CAST(n_docs AS DOUBLE)
             ) * 1e9) AS BIGINT) AS gate
      FROM counts, tot
    )
    SELECT d.lang,
           r.n_docs,
           count(*) AS n_selected,
           CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS selected_bytes,
           min(d.doc_id) AS first_doc_id
    FROM documents d
    JOIN rates r USING (lang)
    WHERE (CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
           AS BIGINT) % 1000000000) < r.gate
    GROUP BY d.lang, r.n_docs
    """,
    "Mixture materialization: the documents actually selected under "
    "alpha=0.5 temperature rebalancing at a 20%-of-corpus budget — "
    "content-stable hash gates per language, so the sample is "
    "reproducible run-to-run and engine-to-engine",
)
def mixture_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the sampling story: lang_temperature_sampling computes
    the weights; this query SELECTS the documents. Per-language accept
    rate = min(1, weight x budget / n_lang), gated by the same 60-bit
    md5 the export sharder uses (mod 1e9 against floor(rate x 1e9)) —
    no RNG, so resampling after corpus edits keeps every surviving
    doc's verdict. All rate arithmetic is sqrt/divide/multiply in IEEE
    order mirrored in the oracle, so gates agree bit-for-bit. The plan:
    one 5-row rates aggregate broadcast into the corpus scan, one
    filter, one group-by — linear, single wide pass at 100 TB."""
    from ..operators.dedup import h60_col

    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
        F.sum("n_docs").cast("double").alias("total"),
    )
    rate = F.least(
        F.lit(1.0),
        F.sqrt(F.col("n_docs").cast("double"))
        / F.col("z")
        * (F.col("total") * MIX_FRACTION)
        / F.col("n_docs").cast("double"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.floor(rate * 1e9).cast("long").alias("gate"),
    )
    gate_hash = h60_col(F.col("doc_id").cast("string")) % F.lit(1_000_000_000)
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(gate_hash < F.col("gate"))
        .groupBy("lang", "n_docs")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum(F.octet_length(F.encode(F.col("text"), "UTF-8"))).alias(
                "selected_bytes"
            ),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 95  # train < 90 <= val < 95 <= test


@register(
    "corpus_split_train_val_test",
    f"""
    WITH b AS (
      SELECT lang, n_chars,
             CAST(CONCAT('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN bucket < {SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM b
    GROUP BY 1, 2
    """,
    "Deterministic hash-gated train/val/test split (90/5/5): assignment "
    "is a pure function of doc_id, so it is stable across runs, "
    "engines, and repartitions — the split step every training-corpus "
    "pipeline needs, with per-split per-lang accounting",
)
def corpus_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle assignment (one md5 per row at the scan) + one
    partial-aggregated rollup. At 100 TB the split column would be
    written back; here the accounting IS the query."""
    from ..operators.dedup import h60_col

    docs = _t(spark, sf_dir, "documents")
    bucket = (
        h60_col(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Curriculum buckets (ntile by document length within language)
# ---------------------------------------------------------------------------


@register(
    "curriculum_ntile_buckets",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             ntile(10) OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id) AS bucket
      FROM documents
    )
    SELECT lang, bucket,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM ranked
    GROUP BY lang, bucket
    """,
    "Curriculum assignment: ntile(10) difficulty buckets by document "
    "length within each language (longest-first), with per-bucket "
    "bounds — the staged-sampling precursor of curriculum training",
)
def curriculum_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on lang for the ntile window (total order per lang,
    doc_id tie-break makes it deterministic); the rollup reuses the
    window's lang partitioning prefix."""
    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("lang", "n_chars", F.ntile(10).over(w).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source duplicate overlap matrix
# ---------------------------------------------------------------------------


@register(
    "cross_source_overlap",
    """
    WITH h AS (SELECT DISTINCT source, md5(text) AS th FROM documents)
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
    FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
    GROUP BY 1, 2
    """,
    "Cross-source contamination matrix: per source pair, the count of "
    "distinct texts appearing in both — the mirror/syndication report "
    "that decides which crawl sources are worth keeping",
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text collapses to md5 AT THE SCAN (32-byte hashes shuffle, text
    never does); the distinct and the self-join share the th hash
    partitioning. Source cardinality is tiny, so the output is a small
    matrix regardless of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.select("source", F.md5("text").alias("th")).distinct()
    a = h.select(F.col("source").alias("source_a"), "th")
    b = h.select(F.col("source").alias("source_b"), "th")
    return (
        a.join(b, "th")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
