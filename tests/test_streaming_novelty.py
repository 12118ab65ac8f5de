"""E2E checks for the streaming fuzzy-dedup loop (lake-backed LSH
index + per-micro-batch probe): crafted semantic regimes, redelivery
idempotence, and a real readStream/foreachBatch drive."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.streaming.novelty import (
    DEFAULT_MATCH_MIN,
    StreamingNoveltyDedup,
    novelty_sig_rows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _w(n, base, start=0):
    return " ".join(f"{base}{i}" for i in range(start, start + n))


class TestSigRows:
    def test_long_docs_get_bands_short_docs_get_text_key(self, spark):
        df = _docs(
            spark,
            [(1, _w(20, "a"), "en"), (2, "too short", "en"), (3, "too short", "en")],
        )
        rows = novelty_sig_rows(df).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.doc_id, []).append(r)
        assert len(by_id[1]) == 4  # one row per band
        assert {r.band for r in by_id[1]} == {0, 1, 2, 3}
        assert len(by_id[2]) == 1 and by_id[2][0].band_key.startswith("t_")
        # identical short texts share the exact-text key with sentinel sigs
        assert by_id[2][0].band_key == by_id[3][0].band_key
        assert by_id[2][0].s0 == -1


class TestNoveltyLoop:
    def test_flags_and_index_growth(self, spark, tmp_path):
        corpus = _docs(spark, [(0, _w(30, "c"), "en"), (1, "tiny text", "en")])
        ded = StreamingNoveltyDedup(spark, str(tmp_path), "idx")
        ded.bootstrap(corpus)

        near = _w(30, "c").split()
        near[5] = "changed"  # 1/30 words → high Jaccard, still near-dup
        batch1 = _docs(
            spark,
            [
                (10, _w(30, "c"), "en"),       # exact dup of corpus → dup
                (11, " ".join(near), "en"),     # near-dup of corpus → dup
                (12, _w(30, "x"), "en"),        # novel
                (13, "tiny text", "en"),        # short exact dup → dup
                (14, "other tiny", "en"),       # short novel
                (15, _w(30, "y"), "en"),        # novel, dup'd within batch:
                (16, _w(30, "y"), "en"),        # keep-first → 16 flagged
            ],
        )
        novel1 = sorted(r.doc_id for r in ded.process_batch(batch1).collect())
        assert novel1 == [12, 14, 15]

        # batch 2 probes an index that now includes batch-1 novels
        batch2 = _docs(
            spark,
            [(20, _w(30, "x"), "en"), (21, _w(30, "z"), "en")],
        )
        novel2 = sorted(r.doc_id for r in ded.process_batch(batch2).collect())
        assert novel2 == [21]

    def test_redelivery_appends_nothing(self, spark, tmp_path):
        ded = StreamingNoveltyDedup(spark, str(tmp_path), "idx")
        ded.bootstrap(_docs(spark, [(0, _w(25, "c"), "en")]))
        batch = _docs(spark, [(10, _w(25, "n"), "en")])
        assert ded.process_batch(batch).count() == 1
        v_after_first = ded.table.current_version()
        # redelivered batch: every doc now matches its own index rows
        assert ded.process_batch(batch).count() == 0
        assert ded.table.current_version() == v_after_first

    def test_txn_marker_short_circuits(self, spark, tmp_path):
        ded = StreamingNoveltyDedup(spark, str(tmp_path), "idx")
        ded.bootstrap(_docs(spark, [(0, _w(25, "c"), "en")]))
        batch = _docs(spark, [(10, _w(25, "n"), "en")])
        assert ded.process_batch(batch, txn=("app", 1)).count() == 1
        # same epoch replay: marker hit, no probe, no rows
        assert ded.process_batch(batch, txn=("app", 1)).count() == 0

    def test_match_min_boundary(self, spark, tmp_path):
        # match_min above NUM_PERM ⇒ only impossible agreement flags →
        # everything (even an exact long-doc dup at 16/16) needs >16
        ded = StreamingNoveltyDedup(
            spark, str(tmp_path), "idx", match_min=17
        )
        ded.bootstrap(_docs(spark, [(0, _w(25, "c"), "en")]))
        out = ded.process_batch(_docs(spark, [(10, _w(25, "c"), "en")]))
        assert out.count() == 1
        assert DEFAULT_MATCH_MIN <= 16


class TestForeachBatchDrive:
    def test_real_stream_dedups_across_microbatches(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        sink = tmp_path / "accepted"
        sink.mkdir()
        ded = StreamingNoveltyDedup(spark, str(tmp_path / "lake"), "idx")
        ded.bootstrap(_docs(spark, [(0, _w(30, "c"), "en")]))

        def write_file(name, rows):
            with open(src / name, "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")

        write_file(
            "b1.json",
            [
                {"doc_id": 10, "text": _w(30, "c"), "lang": "en"},
                {"doc_id": 11, "text": _w(30, "n"), "lang": "en"},
            ],
        )

        def sink_fn(df, epoch_id):
            novel = ded.process_batch(df)
            (novel.write.mode("append").format("json").save(str(sink / "out")))

        q = (
            spark.readStream.format("json")
            .schema("doc_id long, text string, lang string")
            .load(str(src))
            .writeStream.foreachBatch(sink_fn)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            # second micro-batch: a dup of batch-1's novel doc + one new
            write_file(
                "b2.json",
                [
                    {"doc_id": 20, "text": _w(30, "n"), "lang": "en"},
                    {"doc_id": 21, "text": _w(30, "q"), "lang": "en"},
                ],
            )
            q.processAllAvailable()
        finally:
            q.stop()
        accepted = sorted(
            r.doc_id
            for r in spark.read.format("json").load(str(sink / "out")).collect()
        )
        assert accepted == [11, 21]
