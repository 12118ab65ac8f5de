"""Sub-stage profile of minhash_candidate_pairs at sf0.1."""

from __future__ import annotations

import time

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators import dedup as d
from ducklake_kafka_connect_spark.session import build_session
from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s -> {r}", flush=True)
    return r


def run(spark):
    docs = load_parquet(spark, f"{SF}/documents.parquet")
    id_col, text_col = "doc_id", "text"
    sig_cols = [f"s{i}" for i in range(d.NUM_PERM)]
    hashed = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("__th"), F.col(text_col))
    groups = hashed.groupBy("__th").agg(
        F.min(id_col).alias("__trep"), F.first(text_col).alias(text_col)
    ).persist()
    t("text-collapse", lambda: groups.count())
    sig_table = d.minhash_signatures(
        groups.select(F.col("__trep").alias(id_col), text_col), id_col, text_col
    )
    withrep = sig_table.withColumn("rep", F.min(id_col).over(W.partitionBy(*sig_cols))).persist()
    t("signatures+collapse", lambda: withrep.count())
    reps = withrep.filter(F.col(id_col) == F.col("rep")).select(id_col, *sig_cols)
    banded = reps.select(
        id_col, F.explode(d.band_keys_col([F.col(c) for c in sig_cols])).alias("band_key")
    )
    sized = banded.withColumn(
        "bucket_n", F.count(F.lit(1)).over(W.partitionBy("band_key"))
    ).filter(F.col("bucket_n") <= d.MAX_BUCKET).persist()
    t("banding", lambda: sized.count())
    a = sized.select(F.col(id_col).alias("id_a"), "band_key")
    b = sized.select(F.col(id_col).alias("id_b"), "band_key")
    cross = a.join(b, "band_key").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    t("cross-join", lambda: cross.count())
    for x in (groups, withrep, sized):
        x.unpersist()


def main():
    spark = build_session(app_name="profile-cands")
    spark.range(100).count()
    for i in range(2):
        print(f"--- pass {i} ---")
        run(spark)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
