"""Mixed-format dispatch (A7): one batch interleaving Arrow IPC and
JSON payloads decodes each row with its native path
(``connect/DucklakeSinkTask.java:630-638`` is the model)."""

import json

import pyarrow as pa

from ducklake_kafka_connect_spark.sources.arrow_ipc import encode_ipc
from ducklake_kafka_connect_spark.sources.mixed_format import (
    decode_mixed,
    split_by_format,
)


def _mixed_df(spark):
    ipc = encode_ipc(pa.table({"id": pa.array([1, 2], pa.int64()),
                               "v": pa.array(["a", "b"], pa.string())}))
    rows = [
        (ipc,),
        (json.dumps({"id": 3, "v": "c"}).encode(),),
        (json.dumps({"id": 4, "v": "d"}).encode(),),
    ]
    return spark.createDataFrame(rows, "value binary")


def test_split_predicate(spark):
    df = _mixed_df(spark)
    arrow_rows, other = split_by_format(df)
    assert arrow_rows.count() == 1
    assert other.count() == 2


def test_decode_mixed_unions_both_paths(spark):
    out = decode_mixed(_mixed_df(spark))
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_all_json_batch(spark):
    df = spark.createDataFrame(
        [(json.dumps({"id": 9}).encode(),)], "value binary"
    )
    assert decode_mixed(df).collect()[0]["id"] == 9
