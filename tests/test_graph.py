"""TextRank invariants. The heavy cross-engine equality runs in
test_entry_oracle; here the oracle formulation is stressed as the
executable spec (DuckDB-only — cheap), plus one Spark run for shape.
"""

import duckdb
import pytest

from ducklake_kafka_connect_spark.plans.graph import (
    BASE_MICRO,
    INIT_MICRO,
    TEXTRANK_TOP_K,
)
from ducklake_kafka_connect_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


def _oracle_all_ranks(con):
    """Oracle CTE chain minus the LIMIT — full rank vector."""
    sql = QUERIES["textrank_keywords"].oracle
    return con.execute(
        sql.replace(f"LIMIT {TEXTRANK_TOP_K}", "")
    ).fetchall()


def test_rank_mass_is_conserved_up_to_truncation(ddb):
    """Damped PageRank on a symmetric graph preserves total mass:
    sum(r) = N * 1e6 exactly in reals; integer truncation only ever
    LOSES mass, bounded by (#edges + #nodes) lost units per round."""
    ranks = _oracle_all_ranks(ddb)
    n = len(ranks)
    total = sum(r for _, r in ranks)
    n_edges = ddb.execute(
        """
        WITH w AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
                   FROM documents),
        adj AS (SELECT unnest(list_transform(generate_series(1, len(w)-1),
                       i -> {'u': w[i], 'v': w[i+1]})) AS p
                FROM w WHERE len(w) >= 2)
        SELECT count(DISTINCT (p.u, p.v)) * 2 FROM adj WHERE p.u <> p.v
        """
    ).fetchone()[0]
    assert total <= n * INIT_MICRO
    assert total >= n * INIT_MICRO - 3 * (n_edges + 2 * n)


def test_ranks_bounded_below_by_base(ddb):
    ranks = _oracle_all_ranks(ddb)
    assert all(r >= BASE_MICRO for _, r in ranks)


def test_top_keyword_is_high_degree(ddb):
    """PageRank on a co-occurrence graph correlates with weighted
    degree: the top-ranked token must be among the top-5 by degree."""
    ranks = sorted(_oracle_all_ranks(ddb), key=lambda t: (-t[1], t[0]))
    top_by_degree = [
        t
        for t, in ddb.execute(
            """
        WITH w AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
                   FROM documents),
        adj AS (SELECT unnest(list_transform(generate_series(1, len(w)-1),
                       i -> {'u': w[i], 'v': w[i+1]})) AS p
                FROM w WHERE len(w) >= 2),
        dir AS (SELECT p.u AS u FROM adj WHERE p.u <> p.v
                UNION ALL SELECT p.v FROM adj WHERE p.u <> p.v)
        SELECT u FROM dir GROUP BY u ORDER BY count(*) DESC, u LIMIT 5
        """
        ).fetchall()
    ]
    assert ranks[0][0] in top_by_degree


def test_spark_top_k_shape(spark):
    rows = QUERIES["textrank_keywords"].fn(spark, SF_DIR).collect()
    assert len(rows) == TEXTRANK_TOP_K
    ranks = [r.rank_micro for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert len({r.token for r in rows}) == TEXTRANK_TOP_K
