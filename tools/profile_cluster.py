"""Stage-level profile of dedup_cluster_keep_best at sf0.1."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators import dedup as dedup_ops
from ducklake_kafka_connect_spark.session import build_session
from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


def run(spark):
    docs = load_parquet(spark, f"{SF}/documents.parquet")
    cands = dedup_ops.minhash_candidate_pairs(docs)
    t("candidates.count", lambda: cands.count())
    pairs = dedup_ops.minhash_dedup_pairs(docs)
    t("pairs.count", lambda: pairs.count())
    comp = dedup_ops.dedup_clusters(pairs, out_id="id")
    t("clusters.count", lambda: comp.count())
    joined = comp.join(docs.select("doc_id", "n_chars"), comp.id == F.col("doc_id"))
    t("final.count", lambda: joined.count())


def main():
    spark = build_session(app_name="profile-cluster")
    spark.range(100).count()
    for i in range(2):
        print(f"--- pass {i} ---")
        run(spark)
        dedup_ops.release_cached()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
