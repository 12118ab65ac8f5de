"""Capture before/after plan evidence for the kcenter_coreset persist chain.

kcenter is a driver-iterative loop, so the plan that matters is the ROUND-i
intermediate frame the argmax executes, not the tiny result frame. This probe
builds round 3's frame both ways with the module's real distance helper:

  before: round i re-derives mind from the root cache — a chain of i
          withColumns, each a 64-term literal distance fold (O(k^2) passes
          across the loop, plan text grows per round);
  after:  round i reads round i-1's persisted mind column — one distance
          fold over an InMemoryTableScan (O(k) passes).

Usage: PYTHONPATH=/root/repo python tools/r14_kcenter_plan.py
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators.similarity import _d2_micro_col
from ducklake_kafka_connect_spark.plans.queries import _t
from ducklake_kafka_connect_spark.session import build_session

SF = "/root/testdata/sf0.1"
HDR = (
    "# kcenter_coreset_select — round-3 intermediate frame (the argmax input),\n"
    "# captured by tools/r14_kcenter_plan.py with the module's _d2_micro_col.\n"
    "# The declared query's RESULT frame is a tiny createDataFrame either way;\n"
    "# the loop's per-round lineage is what the r14 change alters.\n"
)


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = build_session(app_name="r14-kcenter-plan")
    emb = _t(spark, SF, "embeddings")
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).cache()
    rows = v.orderBy("id").limit(3).collect()
    centers = [list(r["v"]) for r in rows]  # stand-ins for the greedy picks

    def dist(c):
        return _d2_micro_col(F.col("v"), F.array(*[F.lit(float(x)) for x in c]))

    # BEFORE: chain of withColumns re-derived from the root each round.
    df_b = v
    for i, c in enumerate(centers):
        d = dist(c)
        df_b = df_b.withColumn(
            "mind", d if i == 0 else F.least(F.col("mind"), d)
        )
    with open("plans/r14/kcenter_coreset_select_before.txt", "w") as f:
        f.write(HDR + "# BEFORE: round 3 re-derives the whole chain from the root.\n\n")
        f.write(explain_str(df_b.orderBy(F.desc("mind"), "id").limit(1)))

    # AFTER: rounds 1..2 persisted; round 3 is ONE fold over the cached frame.
    df_a = v
    prev = None
    for i, c in enumerate(centers):
        d = dist(c)
        df_a = df_a.withColumn(
            "mind", d if i == 0 else F.least(F.col("mind"), d)
        ).persist()
        df_a.count()  # materialize, as the in-loop argmax does
        if prev is not None:
            prev.unpersist()
        prev = df_a
    with open("plans/r14/kcenter_coreset_select_after.txt", "w") as f:
        f.write(HDR + "# AFTER: round 3 reads round 2's persisted mind (InMemoryTableScan).\n\n")
        f.write(explain_str(df_a.orderBy(F.desc("mind"), "id").limit(1)))
    print("wrote plans/r14/kcenter_coreset_select_{before,after}.txt")


if __name__ == "__main__":
    main()
