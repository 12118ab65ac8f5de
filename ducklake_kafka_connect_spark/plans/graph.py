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
from ..lake.relation_cache import local_rows_df

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


# ---------------------------------------------------------------------------
# Recursive-CTE BFS over the k-NN graph (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

BFS_MOD = 3          # deterministic node sample: vec_id % 3 == 0
BFS_MAX_DEPTH = 4    # bounded recursion: UNION ALL + depth guard
BFS_DIM = 64


def _bfs_dot(a: str, b: str, base: int) -> str:
    """Unrolled left-assoc dot (similarity._dot_sql convention); base=0
    for Spark arrays, 1 for DuckDB lists — identical fold order, so
    cosines (and therefore the NN edge set) are bit-identical."""
    return " + ".join(
        f"CAST({a}[{j}] AS DOUBLE) * CAST({b}[{j}] AS DOUBLE)"
        for j in range(base, base + BFS_DIM)
    )


def _bfs_sql(table: str, base: int) -> str:
    """One SQL text, two dialect instantiations (array base is the only
    difference): NN-graph construction + depth-bounded recursive BFS.

    Spark 4.1 supports WITH RECURSIVE with UNION ALL only (no UNION
    fixpoint yet), so the walk is DEPTH-BOUNDED — guaranteed to
    terminate on the cyclic mutual-NN graph — and per-node first-visit
    depth is recovered with min(d) AFTER the loop, standard BFS
    accounting under path enumeration."""
    nrm = _bfs_dot("embedding", "embedding", base)
    dot = _bfs_dot("a.embedding", "b.embedding", base)
    return f"""
    WITH RECURSIVE vn AS (
      SELECT vec_id, embedding, sqrt({nrm}) AS nrm
      FROM {table} WHERE vec_id % {BFS_MOD} = 0
    ),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             ROUND(({dot}) / (a.nrm * b.nrm), 6) AS sim
      FROM vn a JOIN vn b ON a.vec_id <> b.vec_id
    ),
    nn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY sim DESC, dst ASC) AS rn
        FROM pairs) t
      WHERE rn = 1
    ),
    sym AS (SELECT src AS a, dst AS b FROM nn
            UNION
            SELECT dst AS a, src AS b FROM nn),
    seed AS (SELECT min(vec_id) AS s FROM vn),
    walk(node, d) AS (
      SELECT s, 0 FROM seed
      UNION ALL
      SELECT sym.b, walk.d + 1
      FROM walk JOIN sym ON sym.a = walk.node
      WHERE walk.d < {BFS_MAX_DEPTH}
    ),
    lvl AS (SELECT node, min(d) AS dist FROM walk GROUP BY node)
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM lvl GROUP BY dist ORDER BY dist
    """


@register(
    "knn_graph_bfs",
    _bfs_sql("embeddings", 1),
    "Recursive-CTE BFS over the nearest-neighbor graph of a sampled "
    "embedding set: NN edges from bit-identical unrolled cosines, "
    f"symmetrized, walked to depth {BFS_MAX_DEPTH} from the lowest-id "
    "seed (Spark 4 WITH RECURSIVE / UnionLoop; frontier sizes per hop "
    "— the duplicate-cluster-reach diagnostic)",
)
def knn_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recursion itself is Catalyst's UnionLoop — each step is one
    broadcast-friendly join of the frontier against the edge list, so
    the distributed shape is textbook iterative BFS (frontier rows,
    not corpus rows, flow between steps). The loop re-executes every
    CTE it references per iteration, so the expensive NN-graph build is
    materialized ONCE (persisted edge view + driver-held seed — a
    bounded planning aggregate) and only the tiny symmetric edge list
    sits inside the recursion. The all-pairs block is a mod-gated
    sample: |sample|² scored pairs with a per-src TakeOrdered — the
    sample bound (not the corpus) sets the cost, and the LSH/IVF
    families remain the unbounded-scale path."""
    from pyspark.sql import Window as W

    view = "embeddings_bfs_src"
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView(view)
    # r14 (guide §1/§2.5/§7.2, same fix as the matryoshka harness): the
    # Spark side spells the dot as an aggregate(zip_with(...)) left-fold
    # — bit-identical to the unrolled chain (0.0 + t == t) but a LOOP in
    # codegen instead of 64 inlined terms, which the unrolled spelling
    # pushed into interpreted evaluation (the N² pairs stage measured
    # ~22 s serial) — and repartitions the streamed side of the
    # broadcast-nested-loop join across the session's parallelism (the
    # sample arrives as ONE scan partition at bench scale). Oracle SQL
    # text (_bfs_sql) is unchanged.
    fold = (
        "aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    nrm = fold.format(a="embedding", b="embedding")
    dot = fold.format(a="a.embedding", b="b.embedding")
    n_part = spark.sparkContext.defaultParallelism
    vn = spark.sql(
        f"SELECT vec_id, embedding, sqrt({nrm}) AS nrm FROM {view} "
        f"WHERE vec_id % {BFS_MOD} = 0"
    )
    vn.createOrReplaceTempView("bfs_vn")
    pairs = spark.sql(
        f"""SELECT /*+ BROADCAST(b) */ a.vec_id AS src, b.vec_id AS dst,
                   ROUND(({dot}) / (a.nrm * b.nrm), 6) AS sim
            FROM (SELECT /*+ REPARTITION({n_part}) */ * FROM bfs_vn) a
            JOIN bfs_vn b ON a.vec_id <> b.vec_id"""
    )
    rn = F.row_number().over(
        W.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst").asc())
    )
    nn = pairs.withColumn("rn", rn).filter(F.col("rn") == 1).select("src", "dst")
    sym = (
        nn.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(nn.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    sym.persist()
    sym.createOrReplaceTempView("bfs_sym")
    seed = vn.agg(F.min("vec_id")).head()[0]  # bounded planning scalar
    if seed is None:
        # mod-gated sample is empty at this scale: an empty result frame
        # beats interpolating None into the recursive SQL (parse error)
        return local_rows_df(spark, 
            [], "dist bigint, n_nodes bigint, min_node bigint, max_node bigint"
        )
    return spark.sql(
        f"""
        WITH RECURSIVE walk(node, d) AS (
          SELECT CAST({seed} AS BIGINT), 0
          UNION ALL
          SELECT s.b, walk.d + 1
          FROM walk JOIN bfs_sym s ON s.a = walk.node
          WHERE walk.d < {BFS_MAX_DEPTH}
        ),
        lvl AS (SELECT node, min(d) AS dist FROM walk GROUP BY node)
        SELECT CAST(dist AS BIGINT) AS dist,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(min(node) AS BIGINT) AS min_node,
               CAST(max(node) AS BIGINT) AS max_node
        FROM lvl GROUP BY dist ORDER BY dist
        """
    )
