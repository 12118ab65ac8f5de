"""Semantic invariants for the SQL-surface/data-quality wave
(plans/quality.py) — properties beyond the oracle twin's equality.
"""

import duckdb
import pytest

from ducklake_kafka_connect_spark.plans.quality import BIN_CENTS
from ducklake_kafka_connect_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_set_ops_partition_identity(spark, ddb):
    row = QUERIES["set_ops_priority_customers"].fn(spark, SF_DIR).collect()[0]
    # inclusion-exclusion: either = both + urgent_only + high_only
    assert row.n_either == row.n_both + row.n_urgent_only + row.n_high_only
    n_urgent = ddb.execute(
        "SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderpriority='1-URGENT'"
    ).fetchone()[0]
    assert row.n_both + row.n_urgent_only == n_urgent


def test_moving_sum_range_frame_spans_value_gaps(spark):
    """The RANGE frame must sum over day VALUES, not adjacent rows:
    whenever a day gap occurs, the trailing window excludes days older
    than 6 — re-derive a few windows by hand."""
    rows = QUERIES["moving_sum_range_frame"].fn(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    # reconstruct daily singles from the window rows themselves: day's own
    # contribution = cents_7d minus the previous days inside the frame
    for t, series in by_type.items():
        daily = {}
        for r in sorted(series, key=lambda r: r.day_idx):
            in_frame = sum(
                v for d, v in daily.items() if r.day_idx - 6 <= d < r.day_idx
            )
            daily[r.day_idx] = r.cents_7d - in_frame
        # every reconstructed window must then agree
        for r in series:
            expect = sum(
                v for d, v in daily.items() if r.day_idx - 6 <= d <= r.day_idx
            )
            assert r.cents_7d == expect, (t, r.day_idx)


def test_profile_counts_consistent(spark, ddb):
    rows = QUERIES["table_profile_lineitem"].fn(spark, SF_DIR).collect()
    n = ddb.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    assert len(rows) == 5
    for r in rows:
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n - r.n_nulls
        assert r.min_value is not None and r.max_value is not None


def test_fk_audit_consistent_testdata(spark):
    row = QUERIES["fk_integrity_audit"].fn(spark, SF_DIR).collect()[0]
    # TPC-H-ish generator is referentially consistent
    assert row.lineitem_orphans == 0
    assert row.order_orphans == 0
    assert row.lineitem_orderkeys <= row.order_rows


def test_fk_audit_detects_planted_orphans(spark, tmp_path):
    """Plant orphan rows and confirm the audit counts them."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    for t in ("orders", "lineitem", "customer"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')
          UNION ALL
          SELECT -1, 1, 1, 1, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM (SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet') LIMIT 1)
        ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    row = QUERIES["fk_integrity_audit"].fn(spark, str(d)).collect()[0]
    assert row.lineitem_orphans == 1


def test_quantile_bins_bracket_exact_percentiles(spark, ddb):
    rows = QUERIES["quantile_bin_sketch"].fn(spark, SF_DIR).collect()
    assert [r.pct for r in rows] == [50, 90, 99]
    for r in rows:
        exact = ddb.execute(
            f"SELECT CAST(floor(quantile_disc(o_totalprice, {r.pct/100.0}) * 100) AS BIGINT) FROM orders"
        ).fetchone()[0]
        assert r.bin_lo_cents <= exact < r.bin_hi_cents, r.pct
        assert r.bin_hi_cents - r.bin_lo_cents == BIN_CENTS
