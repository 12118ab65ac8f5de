"""Multimodal plumbing tests: schemas, mapInPandas batch shapes, null
handling, frame sampling — the parts that stay when a real codec
replaces the deterministic fake."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_decode_dims,
    fake_decode_image,
    media_from_documents,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, "word " * (10 + i)) for i in range(9)], "doc_id long, text string"
    )
    return media_from_documents(docs)


class TestMedia:
    def test_schema_and_kinds(self, media):
        assert dict(media.dtypes)["data"] == "binary"
        kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
        assert kinds == {"image", "audio", "video"}
        m = media.select("meta.n_bytes", F.octet_length("data").alias("n")).collect()
        assert all(r["n_bytes"] == r["n"] for r in m)

    def test_decode_matches_local(self, media):
        rows = {r["media_id"]: r for r in fake_decode_image(media).collect()}
        payloads = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
        for mid, p in payloads.items():
            w, h, c, s = fake_decode_dims(p)
            assert (rows[mid]["width"], rows[mid]["height"], rows[mid]["channels"],
                    rows[mid]["byte_sum"]) == (w, h, c, s)

    def test_decode_null_payload(self, spark):
        df = spark.createDataFrame(
            [(1, "image", None, None)],
            "media_id long, kind string, data binary, meta struct<mime:string,n_bytes:bigint,fps:double,duration_ms:bigint>",
        )
        row = fake_decode_image(df).collect()[0]
        assert row["width"] is None and row["byte_sum"] is None

    def test_real_decoder_null_rows_for_unknown_formats(self, media):
        # real decode path (round 5): text payloads are no decodable
        # image format, so every row decodes to NULLs — visible in the
        # output rather than an exception (one bad payload must not kill
        # a corpus-wide scan). Real-format decodes: tests/test_codecs.py.
        rows = decode_image(media).collect()
        assert len(rows) == media.count()
        assert all(r["width"] is None for r in rows)

    def test_features_deterministic_fixed_dim(self, media):
        a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
        b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
        assert a == b
        assert all(len(v) == FEATURE_DIM for v in a.values())
        assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)

    def test_frame_sampling_pure_metadata(self, media):
        frames = sample_frames(media, every_ms=1000)
        meta = {
            r["media_id"]: r["duration_ms"]
            for r in media.filter(F.col("kind") == "video")
            .select("media_id", "meta.duration_ms")
            .collect()
        }
        counts = (
            frames.groupBy("media_id").count().collect()
        )
        assert {r["media_id"] for r in counts} == set(meta)
        for r in counts:
            expected = (meta[r["media_id"]] - 1) // 1000 + 1
            assert r["count"] == expected
        # frame_index = floor(ts/1000 * fps); fps=10 → index jumps by 10
        idx = frames.filter(F.col("frame_ts_ms") == 1000).select("frame_index").head()
        if idx:
            assert idx["frame_index"] == 10
