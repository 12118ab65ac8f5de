"""Cell-partitioned IVF lake index: the nprobe probe must prune
manifest files (partition pruning), and scores after the JSON
round-trip must equal scores over the raw vectors."""

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog
from ducklake_kafka_connect_spark.operators.similarity import (
    NUM_CELLS,
    _lcg_hyperplanes,
    build_ivf_index,
    cosine_topk,
    ivf_indexed_topk,
    probe_cells,
)
from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

SF = "/root/testdata/sf0.001"
CENTS = _lcg_hyperplanes(dim=64, n=NUM_CELLS, seed=11)


def test_probe_is_partition_pruning(spark, tmp_path):
    emb = load_parquet(spark, f"{SF}/embeddings.parquet")
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.table("emb_ivf")
    build_ivf_index(t, emb, CENTS)
    m = t.manifest()
    assert len(m.files) > 1, "index should split into multiple cell partitions"
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cells = probe_cells(query, CENTS, nprobe=2)
    kept, pruned = t.prune_files(f"cell IN ({cells[0]}, {cells[1]})")
    assert pruned > 0, "unprobed cells' files must be pruned from the scan"
    probed_parts = {k for k, v in m.files.items() for f in v if f in set(kept)}
    assert len(probed_parts) <= 2


def test_indexed_topk_equals_bruteforce_within_cells(spark, tmp_path):
    emb = load_parquet(spark, f"{SF}/embeddings.parquet")
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.table("emb_ivf2")
    build_ivf_index(t, emb, CENTS)
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    got = ivf_indexed_topk(t, query, CENTS, k=5, nprobe=NUM_CELLS, exclude_ids=[0])
    # nprobe = all cells → must equal the exact brute-force ranking,
    # proving the JSON round-trip did not perturb a single score
    expect = cosine_topk(emb, query, k=5, exclude_ids=[0])
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in expect.collect()]
