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
