"""Compare window-plan vs expression-form minhash signatures at sf0.1."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators import dedup as d
from ducklake_kafka_connect_spark.session import build_session
from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

SF = "/root/testdata/sf0.1"


def expr_sigs(docs, id_col="doc_id", text_col="text"):
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # step 1: materialize per-word hashes (ONE md5 per word)
    hw = docs.select(
        F.col(id_col),
        F.transform(words, lambda w: d.h60_col(w) % d.MERSENNE).alias("hw"),
    )

    def gram(i):
        return d.shingle_hash_combine(
            F.element_at(F.col("hw"), i + 1),
            F.element_at(F.col("hw"), i + 2),
            F.element_at(F.col("hw"), i + 3),
        )

    shh = F.when(
        F.size("hw") < d.SHINGLE_N, F.array().cast("array<bigint>")
    ).otherwise(F.transform(F.sequence(F.lit(0), F.size("hw") - d.SHINGLE_N), gram))
    out = hw.select(F.col(id_col), shh.alias("shh")).filter(F.size("shh") > 0)

    def perm(a, b):
        return lambda h: (F.lit(a) * h + F.lit(b)) % d.MERSENNE

    return out.select(
        F.col(id_col),
        *[
            F.array_min(F.transform("shh", perm(a, b))).alias(f"s{i}")
            for i, (a, b) in enumerate(d.COEFFS)
        ],
    )


def main():
    spark = build_session(app_name="profile-sigs")
    spark.range(100).count()
    docs = load_parquet(spark, f"{SF}/documents.parquet")
    # emulate the collapsed distinct-text input
    groups = docs.groupBy(F.md5("text").alias("__th")).agg(
        F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
    ).select("doc_id", "text").persist()
    groups.count()

    for label, fn in [
        ("window", lambda: d.minhash_signatures(groups).count()),
        ("expr", lambda: expr_sigs(groups).count()),
    ]:
        for r in range(3):
            t0 = time.perf_counter()
            n = fn()
            print(f"{label} run{r}: {time.perf_counter() - t0:.3f}s n={n}", flush=True)

    # cross-check equality
    a = d.minhash_signatures(groups).orderBy("doc_id").collect()
    b = expr_sigs(groups).orderBy("doc_id").collect()
    print("equal:", [tuple(r) for r in a] == [tuple(r) for r in b])


if __name__ == "__main__":
    main()
