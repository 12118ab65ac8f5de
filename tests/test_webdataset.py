"""WebDataset tar-shard source/sink: deterministic shard bytes, member
round-trips, sample grouping, and bad-shard tolerance."""

import io
import tarfile

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.sources.webdataset import (
    _write_tar,
    decode_members,
    encode_shards,
    members_to_samples,
)


def _members_df(spark, n=20, shards=3):
    docs = spark.range(n)
    txt = docs.select(
        F.concat(F.lit("s"), (F.col("id") % shards).cast("string")).alias("shard"),
        F.format_string("%06d", F.col("id")).alias("key"),
        F.lit("txt").alias("ext"),
        F.encode(F.concat(F.lit("body-"), F.col("id")), "UTF-8").alias("payload"),
    )
    meta = docs.select(
        F.concat(F.lit("s"), (F.col("id") % shards).cast("string")).alias("shard"),
        F.format_string("%06d", F.col("id")).alias("key"),
        F.lit("cls").alias("ext"),
        F.encode((F.col("id") % 7).cast("string"), "UTF-8").alias("payload"),
    )
    return txt.unionByName(meta)


def test_roundtrip_preserves_every_member(spark):
    members = _members_df(spark, 20, 3)
    shards = encode_shards(members)
    rows = shards.collect()
    assert len(rows) == 3
    assert sum(r["n_members"] for r in rows) == 40
    back = decode_members(spark.createDataFrame(rows))
    want = sorted(
        (r["shard"], r["key"], r["ext"], bytes(r["payload"]))
        for r in members.collect()
    )
    got = sorted(
        (r["shard"], r["key"], r["ext"], bytes(r["payload"]))
        for r in back.collect()
    )
    assert got == want


def test_shard_bytes_deterministic_across_partitionings(spark):
    members = _members_df(spark, 30, 2)
    a = {r["shard"]: bytes(r["tar"]) for r in encode_shards(members).collect()}
    b = {
        r["shard"]: bytes(r["tar"])
        for r in encode_shards(members.repartition(7).orderBy(F.rand(42))).collect()
    }
    assert a == b


def test_standard_tarfile_reads_our_shards(spark):
    """Interop: a shard must be a plain POSIX tar any loader can read."""
    members = _members_df(spark, 6, 1)
    tar = bytes(encode_shards(members).collect()[0]["tar"])
    with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
        names = tf.getnames()
        assert "000000.txt" in names and "000000.cls" in names
        assert tf.extractfile("000003.txt").read() == b"body-3"


def test_members_to_samples_groups_by_key(spark):
    members = _members_df(spark, 10, 2)
    samples = members_to_samples(members)
    rows = samples.collect()
    assert len(rows) == 10
    r = {row["key"]: row["parts"] for row in rows}
    assert bytes(r["000004"]["txt"]) == b"body-4"
    assert bytes(r["000004"]["cls"]) == b"4"


def test_corrupt_shard_yields_no_rows_not_an_error(spark):
    good = _write_tar([("k.txt", b"ok")])
    df = spark.createDataFrame(
        [("good", bytearray(good)), ("bad", bytearray(b"not a tar at all"))],
        "shard string, tar binary",
    )
    rows = decode_members(df).collect()
    assert [(r["shard"], r["key"]) for r in rows] == [("good", "k")]


def test_stream_shards_decodes_incrementally(spark, tmp_path):
    """binaryFile stream over a shard dir → decode_members: shard files
    appearing in the directory surface as decoded member rows."""
    from ducklake_kafka_connect_spark.sources.webdataset import stream_shards

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    (shard_dir / "s0.tar").write_bytes(
        _write_tar([("a.txt", b"one"), ("a.cls", b"1")])
    )
    (shard_dir / "s1.tar").write_bytes(_write_tar([("b.txt", b"two")]))
    stream = decode_members(stream_shards(spark, str(shard_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("wds_members")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["shard"], r["key"], r["ext"]): bytes(r["payload"])
        for r in spark.sql("SELECT * FROM wds_members").collect()
    }
    assert rows[("s0.tar", "a", "txt")] == b"one"
    assert rows[("s0.tar", "a", "cls")] == b"1"
    assert rows[("s1.tar", "b", "txt")] == b"two"


def test_e2e_stream_shards_decode_png_to_lake(spark, tmp_path):
    """The multimodal ingestion story end to end: tar shards stream in,
    members pivot to samples, PNG payloads decode through the built-in
    codec, and per-sample records land in a lake table."""
    import numpy as np
    from pyspark.sql import functions as F

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.operators import codecs
    from ducklake_kafka_connect_spark.sources.webdataset import (
        members_to_samples,
        stream_shards,
    )

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    rng = np.random.RandomState(7)
    truth = {}
    for s in range(2):
        members = []
        for i in range(3):
            key = f"{s}{i:05d}"
            arr = rng.randint(0, 256, size=(4 + i, 5, 3), dtype=np.uint8)
            truth[key] = arr
            members.append((f"{key}.png", codecs.encode_png(arr)))
            members.append((f"{key}.cls", str(i % 2).encode()))
        (shard_dir / f"shard{s}.tar").write_bytes(_write_tar(members))

    cat = LakeCatalog(spark, str(tmp_path / "lake"))

    def sink(batch, epoch_id):
        samples = members_to_samples(batch)
        import pandas as pd

        def decode(pdfs):
            for pdf in pdfs:
                rows = []
                for _, r in pdf.iterrows():
                    parts = dict(r["parts"])
                    arr = codecs.decode_png(bytes(parts["png"]))
                    rows.append(
                        (r["key"], int(parts["cls"]), arr.shape[1], arr.shape[0],
                         int(arr.sum()) % 1_000_003)
                    )
                yield pd.DataFrame(
                    rows, columns=["key", "label", "width", "height", "byte_sum"]
                )

        decoded = samples.mapInPandas(
            decode,
            "key string, label int, width int, height int, byte_sum long",
        )
        LakeWriter(cat.table("media"), pk=["key"]).write(decoded, txn=("wds", epoch_id))

    from ducklake_kafka_connect_spark.sources.webdataset import decode_members

    q = (
        decode_members(stream_shards(spark, str(shard_dir)))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["key"]: r for r in cat.table("media").read().collect()}
    assert len(got) == 6
    for key, arr in truth.items():
        r = got[key]
        assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
        assert r["byte_sum"] == int(arr.sum()) % 1_000_003
