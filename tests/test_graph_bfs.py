"""Recursive-CTE BFS over the k-NN graph (plans/graph.py::knn_graph_bfs)
— crafted chain geometry pins the hop accounting; Spark (WITH RECURSIVE
UnionLoop) and DuckDB run the same bounded walk.
"""

import math
import os

import duckdb

from ducklake_kafka_connect_spark.plans.graph import (
    BFS_MAX_DEPTH,
    BFS_MOD,
)
from ducklake_kafka_connect_spark.plans.queries import QUERIES


def _chain_embeddings():
    """Six sampled ids (multiples of BFS_MOD) on a unit circle with
    strictly shrinking angular gaps, so each node's nearest neighbor is
    its RIGHT neighbor — the NN graph symmetrizes to a simple path."""
    gaps = [0.5, 0.4, 0.3, 0.2, 0.1]
    angles = [0.0]
    for g in gaps:
        angles.append(angles[-1] + g)
    rows = []
    for k, theta in enumerate(angles):
        vec = [0.0] * 64
        vec[0] = math.cos(theta)
        vec[1] = math.sin(theta)
        rows.append((k * BFS_MOD, vec, 0))
    return rows


def test_chain_bfs_hop_counts(spark, tmp_path):
    rows = _chain_embeddings()
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    got = [tuple(r) for r in QUERIES["knn_graph_bfs"].fn(spark, sf_dir).collect()]
    # path 0-3-6-9-12-15 walked from seed 0 to depth 4: one node per hop
    assert got == [
        (0, 1, 0, 0),
        (1, 1, 3, 3),
        (2, 1, 6, 6),
        (3, 1, 9, 9),
        (4, 1, 12, 12),
    ]
    assert len(got) == BFS_MAX_DEPTH + 1  # id 15 sits one hop beyond
    # oracle agreement on the same fixture
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = con.execute(QUERIES["knn_graph_bfs"].oracle).fetchall()
    con.close()
    assert got == [tuple(r) for r in want]
