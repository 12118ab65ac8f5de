"""WebDataset-style tar-shard source/sink.

Large multimodal training corpora ship as sharded POSIX tar archives
("WebDataset" convention): each sample is a group of adjacent members
sharing a basename key (``000017.jpg``, ``000017.txt``, ``000017.json``),
and a shard is a few hundred MB of samples read sequentially. This
module gives the engine that container with zero third-party
dependencies — stdlib ``tarfile`` inside Arrow-batched ``mapInPandas``
for both directions:

- :func:`encode_shards` — one tar payload per shard group, members
  written key-sorted with zeroed metadata so shard bytes are
  DETERMINISTIC (same input → same bytes on any machine).
- :func:`decode_members` — tar payload → one row per member
  (key, ext, payload), the streaming-friendly flat form.
- :func:`members_to_samples` — pivot members into one row per sample
  with a ``map<ext, payload>`` column.

Scale shape: shards are the parallelism unit (one task decodes one
shard sequentially — exactly how WebDataset is consumed by training
loaders); nothing is held per-shard beyond the current tar stream, and
the decode is a single pass. Reference scope: the Kafka connector
ingests streams (SURVEY §2.A); the tar-shard container is part of the
beyond-parity multimodal surface (BASELINE north star).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("ext", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("tar", T.BinaryType(), False),
        T.StructField("n_members", T.IntegerType(), False),
    ]
)


def _write_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Key-sorted members → deterministic POSIX tar bytes (mtime/uid/gid
    zeroed; no compression — shards are usually stored raw and
    compressed at the storage layer if at all)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in sorted(members):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def encode_shards(
    members: DataFrame,
    shard_col: str = "shard",
    key_col: str = "key",
    ext_col: str = "ext",
    payload_col: str = "payload",
    num_partitions: int | None = None,
) -> DataFrame:
    """(shard, key, ext, payload) rows → (shard, tar, n_members), one
    tar archive per shard. The shuffle moves payload bytes once (the
    groupBy); member order inside a shard is key-sorted, so identical
    logical content yields identical shard bytes regardless of input
    partitioning. Pass ``num_partitions`` when the shard count is known
    and small — the default spark.sql.shuffle.partitions leaves most
    post-shuffle tasks empty (pure scheduling overhead) when shards ≪
    partitions."""
    narrow = members.select(
        F.col(shard_col).alias("shard"),
        F.col(key_col).alias("key"),
        F.col(ext_col).alias("ext"),
        F.col(payload_col).alias("payload"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, grp in pdf.groupby("shard"):
                ms = [
                    (f"{k}.{e}", bytes(p) if p is not None else b"")
                    for k, e, p in zip(grp["key"], grp["ext"], grp["payload"])
                ]
                rows.append((shard, _write_tar(ms), len(ms)))
            yield pd.DataFrame(rows, columns=["shard", "tar", "n_members"])

    # repartition BY shard so each shard's members land in one batch
    part = (
        narrow.repartition(num_partitions, "shard")
        if num_partitions
        else narrow.repartition("shard")
    )
    return part.mapInPandas(build, SHARD_SCHEMA)


def decode_members(
    shards: DataFrame, shard_col: str = "shard", tar_col: str = "tar"
) -> DataFrame:
    """(shard, tar) → one row per member (shard, key, ext, payload).
    One sequential pass per shard; a truncated or non-tar payload
    yields zero rows for that shard rather than failing the stage
    (bad-shard tolerance — the DLQ philosophy of the ingest path)."""
    narrow = shards.select(
        F.col(shard_col).alias("shard"), F.col(tar_col).alias("tar")
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, payload in zip(pdf["shard"], pdf["tar"]):
                if payload is None:
                    continue
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(payload)), mode="r"
                    ) as tf:
                        for info in tf:
                            if not info.isfile():
                                continue
                            name = info.name
                            key, _, ext = name.rpartition(".")
                            if not key:
                                key, ext = name, ""
                            f = tf.extractfile(info)
                            rows.append(
                                (shard, key, ext, f.read() if f else b"")
                            )
                except (tarfile.TarError, EOFError, OSError):
                    continue
            yield pd.DataFrame(rows, columns=["shard", "key", "ext", "payload"])

    return narrow.mapInPandas(explode, MEMBER_SCHEMA)


def stream_shards(spark, shard_dir: str, pattern: str = "*.tar") -> DataFrame:
    """Streaming shard consumption: ``binaryFile`` file stream over a
    shard directory → (shard, tar) rows ready for
    :func:`decode_members`. New shard files landing in the directory
    become new micro-batch rows — the training-loader-style sequential
    shard reader, expressed as a Structured Streaming source. One shard
    file = one row = one decode task."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", pattern)
        .load(shard_dir)
    )
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("shard"),
        F.col("content").alias("tar"),
    )


def members_to_samples(members: DataFrame) -> DataFrame:
    """Member rows → one row per sample: (shard, key, parts) with
    ``parts`` a map<ext, payload>. Pure DataFrame pivot (map_from_entries
    over collect_list) — no Python."""
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ext", "payload")))
            ).alias("parts")
        )
    )
