"""Plan-shape regression guard (r14, VERDICT r13 #6): PLANS.md is
regenerated per round but nothing ASSERTED it — a plan drift (new
shuffle, lost filter pushdown, a Python boundary creeping into a
JVM-only query) waited for a judge audit instead of failing the suite
the round it appeared.

Pins scans / exchanges / broadcasts / python_boundaries (and whether
the scan carries pushed filters) for flagship read-path queries, using
the exact same node-dedup summarizer `tools/explain_audit.py` feeds
PLANS.md with. Write-path flagships (merge_upsert_events,
mor_merge_upsert, matview_minmax_repair) execute commits during plan
construction, so their guard lives elsewhere: the single-manifest-
resolve metrics pin (test_lake_writer.TestSingleManifestResolve) and
the MOR/matview mode assertions inside the queries themselves.

The pins are exact on scans/python (those never legitimately drift
without a deliberate redesign) and exact on exchanges/broadcasts at
pinned shuffle_partitions=4 with AQE as configured by build_session —
if a pin fails after an intentional plan change, update it HERE in the
same commit with a note on why the new shape is better.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from explain_audit import summarize  # noqa: E402

from ducklake_kafka_connect_spark.plans.queries import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# query -> (scans, exchanges, broadcasts, python_boundaries, pushed>0)
PINS = {
    "q1_pricing_summary": (1, 1, 0, 0, True),
    "q3_shipping_priority": (3, 3, 2, 0, True),
    "dedup_minhash_lsh": (4, 14, 7, 0, True),
    "ann_ivfpq_topk": (1, 0, 0, 0, True),
    "similarity_topk": (1, 0, 0, 0, True),
    "hybrid_rrf_retrieval": (2, 11, 4, 0, True),
    "text_token_stats": (1, 1, 0, 0, False),
    "window_rank_suite": (1, 1, 0, 0, False),
    "timeseries_gapfill": (1, 6, 2, 0, False),
    "sql_pruned_point_lookup": (1, 1, 0, 0, True),
    # r14 grouping-analytics block: every clause must stay a single
    # Expand + one-shuffle aggregate (pivot pinned at 1 exchange — the
    # conditional-aggregate form, NOT groupBy().pivot()'s two)
    "rollup_returnflag_hierarchy": (1, 1, 0, 0, False),
    "cube_order_status_priority": (1, 1, 0, 0, False),
    "grouping_sets_event_matrix": (1, 1, 0, 0, False),
    "pivot_event_type_wide": (1, 1, 0, 0, False),
    # as-of joins: one shuffle (the key window), pushed type filters
    "asof_forward_next_purchase": (2, 1, 0, 0, True),
    # r14 session 9: the kNN eval pairs stage — broadcast(q) into the
    # repartitioned corpus, zero Python; the dot is the zip_with fold
    # (entry 18), guarded separately below
    "knn_label_eval": (2, 5, 1, 0, True),
}


@pytest.fixture(scope="module")
def plans(spark):
    # pins must see the session AS BUILT: earlier suite tests leak
    # session state (spark.conf.set, temp views, cached lineage — a
    # cached scan plans as InMemoryTableScan, dropping scan/exchange
    # counts). newSession() re-derives a pristine SQLConf + empty view
    # registry over the same JVM context; the cache is context-shared,
    # so it still clears per explain.
    s = spark.newSession()
    jvm = s._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = {}
    for name in PINS:
        s.catalog.clearCache()
        df = QUERIES[name].fn(s, SF_DIR)
        out[name] = df._jdf.queryExecution().explainString(mode)
    return out


@pytest.mark.parametrize("name", sorted(PINS))
def test_plan_shape_pinned(plans, name):
    scans, exchanges, broadcasts, python, pushed = PINS[name]
    s = summarize(plans[name])
    got = (s["scans"], s["exchanges"], s["broadcasts"], s["python"])
    assert got == (scans, exchanges, broadcasts, python), (
        f"{name}: plan shape drifted — "
        f"(scans, exchanges, broadcasts, python) now {got}, pinned "
        f"{(scans, exchanges, broadcasts, python)}. If this drift is an "
        f"intentional improvement, update PINS with a rationale; if not, "
        f"a shuffle/pushdown/Python-boundary regression just landed."
    )
    assert bool(s["pushed"]) == pushed, (
        f"{name}: pushed-filter presence drifted (now {s['pushed']!r})"
    )


def test_knn_eval_dot_is_fold(plans):
    """Entry 18: the kNN eval dot must stay the aggregate(zip_with(...))
    fold — an unrolled 64-term spelling re-inflates the codegen method
    past the JIT/Janino budgets (measured 1.7 s warm vs 1.0 s, 5.8 s
    cold vs 1.5 s)."""
    plan = plans["knn_label_eval"]
    assert "zip_with" in plan, "kNN dot no longer the zip_with fold"


def test_no_rowwise_python_udf_in_surface_plans(plans):
    """BatchEvalPython (row-at-a-time Python UDF) must never appear —
    the designed Python slots are Arrow-batched (ArrowEvalPython /
    MapInArrow / MapInPandas), and these flagships have none at all."""
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name
