"""Similarity search over embedding columns (beyond-parity operator).

Brute-force cosine top-k is the exact baseline: a single column-pruned
scan computing the score with built-in higher-order functions
(``zip_with`` + ``aggregate``) — fully JVM-side, no Python UDF, no
shuffle except the final top-k (a TakeOrderedAndProject, which runs
as per-partition partial top-k then a driver merge of k·partitions
rows — no full sort at any scale). An LSH-bucketed approximate variant
lives in ``operators/dedup.py`` (shared random-hyperplane machinery).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_similarity_col(vec: Column, query: Sequence[float]) -> Column:
    """cos(vec, query) as a Catalyst expression (double precision).

    Left-to-right accumulation matches DuckDB's list_cosine_similarity
    closely enough that results agree after rounding to 6 decimals.
    """
    q = [float(x) for x in query]
    q_lit = F.array(*[F.lit(x) for x in q])
    v = _as_double(vec)
    dot = F.aggregate(
        F.zip_with(v, q_lit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm_v = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    norm_q = math.sqrt(sum(x * x for x in q))
    return dot / (norm_v * F.lit(norm_q))


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity_col(F.col(vec_col), query), 6).alias("cos_sim"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# LSH-bucketed approximate nearest neighbors (the scale path)
# ---------------------------------------------------------------------------

# 16 buckets: at corpus sizes ≥ ~10k vectors per partition the bucket
# count should scale up (planes ∝ log2(n/target_bucket_size)); 4 planes
# keep the driver-testdata buckets populated while still pruning 15/16.
NUM_HYPERPLANES = 4


def _lcg_hyperplanes(dim: int, n: int = NUM_HYPERPLANES, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (triangular-ish entries in
    [-1, 1)), identical constants inlined into Spark exprs and oracle
    SQL — the bucketing is bit-identical in both engines."""
    state = seed
    planes = []
    for _ in range(n):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(round((state >> 20) / float(1 << 43) * 2.0 - 1.0, 9))
        planes.append(row)
    return planes


def _dot_lit(vec: Column, plane: Sequence[float]) -> Column:
    """Dot product against a CONSTANT plane as an unrolled codegen'd
    multiply-add chain. The higher-order aggregate/zip_with form is
    interpreted per element (~100× slower); unrolling keeps the whole
    expression inside whole-stage codegen. Left-to-right addition order
    matches the fold the oracle's list_dot_product uses, so results stay
    bit-identical."""
    terms = [
        F.element_at(vec, i + 1).cast("double") * F.lit(float(x))
        for i, x in enumerate(plane)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def srp_bucket_col(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Signed-random-projection bucket id: bit i = sign(vec · plane_i)."""
    out = F.lit(0)
    for i, plane in enumerate(planes):
        out = out + F.when(_dot_lit(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def srp_bucket_sql(vec_expr: str, planes: Sequence[Sequence[float]]) -> str:
    terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(repr(x) for x in plane)
        dot = f"list_dot_product({vec_expr}, [{lits}])"
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def ann_lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within the query's SRP
    bucket*. At scale the bucket filter prunes ~255/256 of the corpus
    before any scoring; a bucket-partitioned table layout would turn it
    into partition pruning at the scan. Recall is traded for the prune —
    the exact baseline is ``cosine_topk``."""
    dim = len(query)
    planes = _lcg_hyperplanes(dim)
    q = [float(x) for x in query]
    q_bucket = sum(
        (1 << i) for i, p in enumerate(planes) if sum(a * b for a, b in zip(q, p)) > 0
    )
    v = _as_double(F.col(vec_col))
    scored = df.select(
        F.col(id_col),
        srp_bucket_col(v, planes).alias("bucket"),
        F.round(cosine_similarity_col(F.col(vec_col), query), 6).alias("cos_sim"),
    ).filter(F.col("bucket") == q_bucket)
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return (
        scored.select(id_col, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


NUM_CELLS = 8


def ivf_assign_col(vec: Column, centroids: Sequence[Sequence[float]]) -> Column:
    """IVF coarse quantizer: index of the nearest centroid by dot
    product (centroids get unit-normalized by the caller). A CASE chain
    over NUM_CELLS dots — codegen, no UDF."""
    dots = [_dot_lit(vec, c) for c in centroids]
    best = F.greatest(*dots) if len(dots) > 1 else dots[0]
    out = F.lit(len(centroids) - 1)
    for i in range(len(centroids) - 2, -1, -1):  # earlier index wins ties
        out = F.when(dots[i] == best, F.lit(i)).otherwise(out)
    return out


def ivf_assign_sql(vec_expr: str, centroids: Sequence[Sequence[float]]) -> str:
    dots = []
    for c in centroids:
        lits = ", ".join(repr(float(x)) for x in c)
        dots.append(f"list_dot_product({vec_expr}, [{lits}])")
    best = "greatest(" + ", ".join(dots) + ")"
    whens = " ".join(f"WHEN {d} = {best} THEN {i}" for i, d in enumerate(dots))
    return f"(CASE {whens} END)"


def _unit(v: Sequence[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [round(float(x) / n, 9) for x in v]


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: exact cosine ranking
    within the query's coarse cell. Centroids come from the caller —
    at scale a KMeans fit or a deterministic sample; cells map to a
    bucket-partitioned table layout so the probe is partition pruning.
    Complementary to SRP-LSH: data-adaptive cells vs data-oblivious
    hyperplanes."""
    cents = [_unit(c) for c in centroids]
    q = [float(x) for x in query]
    q_cell = max(
        range(len(cents)),
        key=lambda i: (sum(a * b for a, b in zip(q, cents[i])), -i),
    )
    v = _as_double(F.col(vec_col))
    scored = df.select(
        F.col(id_col),
        ivf_assign_col(v, cents).alias("cell"),
        F.round(cosine_similarity_col(F.col(vec_col), query), 6).alias("cos_sim"),
    ).filter(F.col("cell") == q_cell)
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return (
        scored.select(id_col, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk_sql(
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: int = 0,
) -> str:
    cents = [_unit(c) for c in centroids]
    assign = ivf_assign_sql("v", cents)
    return f"""
    WITH v AS (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v,
             {assign} AS cell
      FROM {table}
    ),
    q AS (SELECT v, cell FROM v WHERE id = {query_id})
    SELECT v.id AS {id_col},
           ROUND(list_cosine_similarity(v.v, (SELECT v FROM q)), 6) AS cos_sim
    FROM v
    WHERE v.cell = (SELECT cell FROM q) AND v.id <> {query_id}
    ORDER BY cos_sim DESC, v.id
    LIMIT {k}
    """


def ann_lsh_topk_sql(
    dim: int,
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: int = 0,
) -> str:
    """DuckDB oracle: identical SRP bucketing + exact cosine within the
    query's bucket."""
    planes = _lcg_hyperplanes(dim)
    bucket = srp_bucket_sql("v", planes)
    return f"""
    WITH v AS (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v,
             {bucket} AS bucket
      FROM {table}
    ),
    q AS (SELECT v, bucket FROM v WHERE id = {query_id})
    SELECT v.id AS {id_col},
           ROUND(list_cosine_similarity(v.v, (SELECT v FROM q)), 6) AS cos_sim
    FROM v
    WHERE v.bucket = (SELECT bucket FROM q) AND v.id <> {query_id}
    ORDER BY cos_sim DESC, v.id
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# IVF over a cell-partitioned lake table: the probe IS partition pruning
# ---------------------------------------------------------------------------


def probe_cells(
    query: Sequence[float], centroids: Sequence[Sequence[float]], nprobe: int
) -> list[int]:
    """Indices of the ``nprobe`` nearest (unit-normalized) centroids by
    dot product, ties to the lower index — the same ordering the SQL
    oracle's ``ORDER BY dot DESC, i`` produces."""
    cents = [_unit(c) for c in centroids]
    q = [float(x) for x in query]
    dots = [sum(a * b for a, b in zip(q, c)) for c in cents]
    return sorted(range(len(cents)), key=lambda i: (-dots[i], i))[:nprobe]


def build_ivf_index(
    table,
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write embeddings into a lake table partitioned by IVF cell.

    This is the 100 TB layout: each coarse cell is a partition
    directory, so an nprobe-cell query turns into manifest-level
    partition pruning — the scan opens nprobe/NUM_CELLS of the data,
    no matter how large the corpus. Vectors are cast to double BEFORE
    the write: the lake stores arrays as JSON text (reference storage
    semantics) and Jackson's double serialization round-trips
    bit-exactly, so scores computed after read-back equal scores over
    the raw parquet."""
    from ..lake.writer import LakeWriter

    cents = [_unit(c) for c in centroids]
    indexed = emb.select(
        F.col(id_col),
        ivf_assign_col(_as_double(F.col(vec_col)), cents).alias("cell"),
        _as_double(F.col(vec_col)).alias(vec_col),
    )
    LakeWriter(table, pk=[id_col], partition_by="cell", auto_create=True).append(indexed)


def ivf_indexed_topk(
    table,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Top-k by exact cosine within the query's ``nprobe`` nearest
    cells, read through ``LakeTable.read(where="cell IN (...)")`` —
    files of unprobed cells are pruned from the manifest and never
    opened."""
    cells = probe_cells(query, centroids, nprobe)
    pred = f"cell IN ({', '.join(str(c) for c in cells)})"
    df = table.read(where=pred).select(
        F.col(id_col),
        F.from_json(F.col(vec_col), "array<double>").alias(vec_col),
    )
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity_col(F.col(vec_col), query), 6).alias("cos_sim"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_indexed_topk_sql(
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    nprobe: int = 2,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: int = 0,
) -> str:
    """DuckDB oracle: identical nprobe-cell probe expressed statically —
    centroid literals + ORDER BY dot DESC LIMIT nprobe (no
    data-dependent constants in the SQL string)."""
    cents = [_unit(c) for c in centroids]
    assign = ivf_assign_sql("v", cents)
    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}])" for i, c in enumerate(cents)
    )
    return f"""
    WITH v AS (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v,
             {assign} AS cell
      FROM {table}
    ),
    q AS (SELECT v FROM v WHERE id = {query_id}),
    cents(i, c) AS (VALUES {cent_rows}),
    probed AS (
      SELECT i FROM cents, q
      ORDER BY list_dot_product(q.v, cents.c) DESC, i
      LIMIT {nprobe}
    )
    SELECT v.id AS {id_col},
           ROUND(list_cosine_similarity(v.v, (SELECT v FROM q)), 6) AS cos_sim
    FROM v
    WHERE v.cell IN (SELECT i FROM probed) AND v.id <> {query_id}
    ORDER BY cos_sim DESC, v.id
    LIMIT {k}
    """
