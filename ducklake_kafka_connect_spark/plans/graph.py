"""Graph analytics over derived corpora, round 5 (sixth wave):
TextRank — PageRank on the token co-occurrence graph — as a fully
deterministic iterative query.

TextRank (Mihalcea & Tarau 2004) is the classic unsupervised keyword
extractor: build an undirected co-occurrence graph over adjacent
tokens, run damped PageRank, take the top-ranked tokens. It is also the
repo's demonstration that ITERATIVE graph algorithms fit the engine's
determinism contract: every iteration is integer arithmetic
(micro-unit ranks, truncating integer division on both engines), so
the oracle — the same three unrolled iterations as SQL CTEs — matches
bit-for-bit, no epsilon.

Scale design: the corpus appears ONCE (the zero-shuffle zip_with
adjacency explode); everything after is vocabulary-sized. Each
iteration is one join + one partial-aggregated shuffle over edges —
the standard distributed PageRank step — with the edge list (+ source
degree) persisted across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, register

DAMP_NUM, DAMP_DEN = 85, 100        # d = 0.85 as an exact rational
BASE_MICRO = 150_000                # (1-d) in micro-units
INIT_MICRO = 1_000_000              # r0 = 1.0
TEXTRANK_ITERS = 3
TEXTRANK_TOP_K = 20


def _textrank_oracle() -> str:
    iters = []
    prev = "r0"
    for k in range(1, TEXTRANK_ITERS + 1):
        iters.append(
            f"""
    r{k} AS (
      SELECT d.u,
             CAST({BASE_MICRO} + ({DAMP_NUM} * COALESCE(s.s, 0)) // {DAMP_DEN}
                  AS BIGINT) AS r
      FROM deg d LEFT JOIN (
        SELECT ew.v AS u,
               CAST(sum((p.r * ew.c) // ew.wdeg) AS BIGINT) AS s
        FROM ew JOIN {prev} p ON p.u = ew.u
        GROUP BY ew.v
      ) s ON s.u = d.u
    )"""
        )
        prev = f"r{k}"
    return f"""
    WITH w AS (
      SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
    ),
    adj AS (
      SELECT unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> {{'u': w[i], 'v': w[i+1]}}
             )) AS p
      FROM w WHERE len(w) >= 2
    ),
    dir AS (
      SELECT p.u AS u, p.v AS v FROM adj WHERE p.u <> p.v
      UNION ALL
      SELECT p.v AS u, p.u AS v FROM adj WHERE p.u <> p.v
    ),
    edges AS (SELECT u, v, count(*) AS c FROM dir GROUP BY u, v),
    deg AS (SELECT u, CAST(sum(c) AS BIGINT) AS wdeg FROM edges GROUP BY u),
    ew AS (SELECT e.u, e.v, e.c, d.wdeg FROM edges e JOIN deg d USING (u)),
    r0 AS (SELECT u, CAST({INIT_MICRO} AS BIGINT) AS r FROM deg),
    {",".join(iters)}
    SELECT u AS token, r AS rank_micro
    FROM {prev}
    ORDER BY r DESC, u
    LIMIT {TEXTRANK_TOP_K}
    """


@register(
    "textrank_keywords",
    _textrank_oracle(),
    "TextRank keyword extraction: damped PageRank over the token "
    "co-occurrence graph, 3 integer-exact iterations, top-20 tokens",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank with the determinism contract applied:
    ranks are BIGINT micro-units; the per-edge transition is
    ``(r * c) DIV wdeg`` (truncating integer division — identical to
    DuckDB's ``//`` on non-negatives) and damping is the exact rational
    85/100, so three iterations stay bit-identical cross-engine.

    Plan: the only corpus-sized operator is the adjacency explode —
    ``zip_with(slice, slice)`` over the token array, zero shuffles,
    fully codegen'd. Edges + source degrees persist across iterations;
    each Lloyd-style step is edges ⋈ ranks (both vocab-sized, shuffled
    on the token key) into one partial-aggregated groupBy. O(log)
    lineage depth is a non-issue at 3 fixed iterations; a convergence
    loop would localCheckpoint every few rounds like operators/dedup's
    CC does."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = (
        docs.select(words.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), "
                    "(a, b) -> struct(a AS u, b AS v))"
                )
            ).alias("p")
        )
        .filter(F.col("p.u") != F.col("p.v"))
    )
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("p.u").alias("u"), F.col("p.v").alias("v")),
                F.struct(F.col("p.v").alias("u"), F.col("p.u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    edges = both.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c"))
    deg = edges.groupBy("u").agg(F.sum("c").cast("long").alias("wdeg"))
    ew = edges.join(deg, "u")
    ew.persist()
    nodes = deg.select("u")
    r = deg.select("u", F.lit(INIT_MICRO).cast("long").alias("r"))
    for _ in range(TEXTRANK_ITERS):
        contrib = (
            ew.join(r, "u")
            .select(F.col("v"), F.expr("(r * c) DIV wdeg").alias("t"))
            .groupBy("v")
            .agg(F.sum("t").cast("long").alias("s"))
            .withColumnRenamed("v", "u")
        )
        r = nodes.join(contrib, "u", "left").select(
            "u",
            (
                F.lit(BASE_MICRO)
                + F.expr(f"({DAMP_NUM} * coalesce(s, 0)) DIV {DAMP_DEN}")
            )
            .cast("long")
            .alias("r"),
        )
    return (
        r.orderBy(F.col("r").desc(), F.col("u"))
        .limit(TEXTRANK_TOP_K)
        .select(F.col("u").alias("token"), F.col("r").alias("rank_micro"))
    )
