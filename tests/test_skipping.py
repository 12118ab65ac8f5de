"""Data skipping: predicate parsing, conservative file pruning, Z-order
layout. The invariant under test everywhere: ``read(where=p)`` returns
exactly ``read().filter(p)`` while opening fewer files."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.maintenance import compact
from ducklake_kafka_connect_spark.lake.skipping import (
    Conjunct,
    file_matches,
    parse_conjuncts,
    prune_files,
)


class TestParser:
    def test_simple_comparisons(self):
        cs = parse_conjuncts("a > 5 AND b <= 'x' AND c = 3.5")
        assert [(c.column, c.op, c.value) for c in cs] == [
            ("a", ">", 5), ("b", "<=", "x"), ("c", "=", 3.5)]

    def test_reversed_literal_side(self):
        (c,) = parse_conjuncts("10 >= a")
        assert (c.column, c.op, c.value) == ("a", "<=", 10)

    def test_between_and_in(self):
        cs = parse_conjuncts("a BETWEEN 1 AND 9 AND b IN ('x', 'y')")
        assert (cs[0].op, cs[0].value) == ("between", (1, 9))
        assert (cs[1].op, cs[1].value) == ("in", ["x", "y"])

    def test_timestamp_literal(self):
        (c,) = parse_conjuncts("ts >= TIMESTAMP '2024-01-02 00:00:00'")
        assert c.value == "2024-01-02 00:00:00"

    def test_or_defeats_pruning(self):
        assert parse_conjuncts("a > 5 OR b < 3") == []

    def test_unknown_conjuncts_dropped_but_known_kept(self):
        cs = parse_conjuncts("length(s) > 3 AND a = 1 AND b IS NOT NULL")
        assert [(c.column, c.op) for c in cs] == [
            ("a", "="),
            ("b", "is_not_null"),
        ]

    def test_parenthesized(self):
        cs = parse_conjuncts("(a > 5) AND (b = 'q')")
        assert len(cs) == 2

    def test_garbage_is_safe(self):
        assert parse_conjuncts("@@ not sql %%") == []


class TestFileMatches:
    def test_range_logic(self):
        st = {"a": [10, 20]}
        assert not file_matches([Conjunct("a", "=", 5)], st)
        assert file_matches([Conjunct("a", "=", 15)], st)
        assert not file_matches([Conjunct("a", "<", 10)], st)
        assert file_matches([Conjunct("a", "<=", 10)], st)
        assert not file_matches([Conjunct("a", ">", 20)], st)
        assert file_matches([Conjunct("a", ">=", 20)], st)
        assert not file_matches([Conjunct("a", "between", (21, 30))], st)
        assert not file_matches([Conjunct("a", "in", [1, 2, 30])], st)
        assert file_matches([Conjunct("a", "in", [1, 15])], st)

    def test_missing_stats_keep(self):
        assert file_matches([Conjunct("zz", "=", 1)], {"a": [0, 1]})
        assert file_matches([Conjunct("a", "=", 99)], None)

    def test_type_mismatch_keeps(self):
        assert file_matches([Conjunct("a", "=", "str")], {"a": [0, 5]})

    def test_unbounded_above_string(self):
        st = {"s": ["aaa", None]}  # truncated long-string stat
        assert file_matches([Conjunct("s", ">", "zzz")], st)
        assert not file_matches([Conjunct("s", "<", "aaa")], st)

    def test_neq_single_value_file(self):
        assert not file_matches([Conjunct("a", "!=", 7)], {"a": [7, 7]})
        assert file_matches([Conjunct("a", "!=", 7)], {"a": [7, 8]})

    def test_prune_files_counts(self):
        stats = {"f1": {"a": [0, 9]}, "f2": {"a": [10, 19]}}
        kept, pruned = prune_files(["f1", "f2", "f3"], stats, "a >= 10")
        assert kept == ["f2", "f3"] and pruned == 1


def _write_ranged(spark, tmp_path, name):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.table(name)
    w = LakeWriter(t, pk=["id"])
    for base in (0, 1000, 2000, 3000):
        w.append(
            spark.range(base, base + 100).select(
                F.col("id"),
                (F.col("id") % 7).alias("bucket"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
    return t, w


class TestPrunedRead:
    def test_pruned_read_equals_filtered_read(self, spark, tmp_path):
        t, _ = _write_ranged(spark, tmp_path, "sk1")
        pred = "id BETWEEN 1000 AND 1049"
        expect = sorted(r["id"] for r in t.read().filter(pred).collect())
        got = sorted(r["id"] for r in t.read(where=pred).collect())
        assert got == expect and len(got) == 50

    def test_files_actually_pruned(self, spark, tmp_path):
        t, _ = _write_ranged(spark, tmp_path, "sk2")
        total = len(t.manifest().all_files())
        kept, pruned = t.prune_files("id >= 3000")
        assert pruned > 0 and len(kept) < total
        # and on a non-PK column with disjoint ranges per file: v strings
        kept_v, pruned_v = t.prune_files("v = 'v3050'")
        assert pruned_v > 0

    def test_unparseable_predicate_still_correct(self, spark, tmp_path):
        t, _ = _write_ranged(spark, tmp_path, "sk3")
        pred = "id % 2 = 0 OR bucket = 3"
        expect = t.read().filter(pred).count()
        assert t.read(where=pred).count() == expect

    def test_empty_result_predicate(self, spark, tmp_path):
        t, _ = _write_ranged(spark, tmp_path, "sk4")
        assert t.read(where="id > 99999").count() == 0


class TestZOrder:
    def test_zorder_prunes_both_columns(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("zo1")
        w = LakeWriter(t, pk=["id"])
        # x and y independently uniform: row-order files have full-range
        # stats on both; z-order makes BOTH selective
        n = 20_000
        df = spark.range(n).select(
            F.col("id"),
            (F.hash(F.col("id")) % 1000).alias("x"),
            (F.hash(F.col("id") + 17) % 1000).alias("y"),
        )
        w.append(df)
        compact(t, zorder_by=["x", "y"], target_files=16)
        m = t.manifest()
        assert len(m.all_files()) == 16
        expect = t.read().filter("x BETWEEN 0 AND 49 AND y BETWEEN 0 AND 49").count()
        kept_x, pruned_x = t.prune_files("x BETWEEN 0 AND 49")
        kept_y, pruned_y = t.prune_files("y BETWEEN 0 AND 49")
        kept_xy, pruned_xy = t.prune_files("x BETWEEN 0 AND 49 AND y BETWEEN 0 AND 49")
        assert pruned_x > 0 and pruned_y > 0, "z-order must make both columns selective"
        assert pruned_xy >= max(pruned_x, pruned_y)
        got = t.read(where="x BETWEEN 0 AND 49 AND y BETWEEN 0 AND 49").count()
        assert got == expect

    def test_zorder_on_timestamp(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("zo2")
        w = LakeWriter(t, pk=["id"])
        df = spark.range(5000).select(
            F.col("id"),
            F.timestamp_seconds(1704067200 + (F.hash("id") % 86400) * 30).alias("ts"),
            (F.hash(F.col("id") + 3) % 100).alias("val"),
        )
        w.append(df)
        compact(t, zorder_by=["ts", "val"], target_files=8)
        pred = "ts >= TIMESTAMP '2024-01-15 00:00:00' AND val < 10"
        expect = t.read().filter(pred).count()
        assert t.read(where=pred).count() == expect
        _, pruned = t.prune_files(pred)
        assert pruned > 0

    def test_zorder_rejects_string_column(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("zo3")
        w = LakeWriter(t, pk=["id"])
        w.append(spark.range(10).select(F.col("id"), F.lit("s").alias("s")))
        with pytest.raises(ValueError, match="unsupported type"):
            compact(t, zorder_by=["s"])


class TestLegacyManifest:
    def test_legacy_list_stats_normalized(self, tmp_path):
        from ducklake_kafka_connect_spark.lake.table import Manifest
        from pyspark.sql import types as T

        m = Manifest.from_json(
            """{"version": 1, "schema": {"type": "struct", "fields":
            [{"name": "id", "type": "long", "nullable": true, "metadata": {}}]},
            "pk": ["id"], "partition_spec": [], "files": {"": ["f1"]},
            "parent": 0, "props": {}, "file_stats": {"f1": [5, 10]}}"""
        )
        assert m.file_stats == {"f1": {"id": [5, 10]}}


class TestBloomSidecars:
    def test_unit_bloom_roundtrip(self):
        from ducklake_kafka_connect_spark.lake.bloom import (
            bloom_might_contain,
            build_bloom,
        )

        blob = build_bloom(list(range(0, 5000, 3)) + ["key_x", None])
        assert all(bloom_might_contain(blob, v) for v in range(0, 5000, 3))
        assert bloom_might_contain(blob, "key_x")
        misses = sum(bloom_might_contain(blob, f"absent_{i}") for i in range(2000))
        assert misses < 60, f"fp rate too high: {misses}/2000"
        assert bloom_might_contain(b"garbage", 1), "malformed blob must keep"

    def test_point_lookup_prunes_interleaved_files(self, spark, tmp_path):
        # every file spans nearly the whole key range → min/max prunes
        # nothing; only the blooms can
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("bl1")
        w = LakeWriter(t, pk=["id"])
        for off in range(4):
            w.append(
                spark.range(0, 4000, 4).select(
                    (F.col("id") + off).alias("id"),
                    F.concat(F.lit("v"), F.col("id") + off).alias("v"),
                )
            )
        files = t.manifest().all_files()
        assert len(files) >= 4
        kept_range, pruned_range = t.prune_files("id >= 0")
        assert pruned_range == 0
        kept, pruned = t.prune_files("id = 1001")  # lives in exactly one file
        assert pruned >= len(files) - 1, f"bloom should isolate the file: {kept}"
        rows = t.read(where="id = 1001").collect()
        assert [r["v"] for r in rows] == ["v1001"]

    def test_in_probe_and_vacuum_cleanup(self, spark, tmp_path):
        import os as _os

        from ducklake_kafka_connect_spark.lake.maintenance import compact, vacuum

        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("bl2")
        w = LakeWriter(t, pk=["id"])
        for off in range(3):
            w.append(
                spark.range(0, 3000, 3).select(
                    (F.col("id") + off).alias("id"), F.lit("x").alias("v")
                )
            )
        kept, pruned = t.prune_files("id IN (7, 3001)")
        assert pruned > 0
        got = sorted(r["id"] for r in t.read(where="id IN (7, 3001)").collect())
        assert got == [7]
        compact(t)
        vacuum(t, keep_versions=1)
        blooms = [
            f for _d, _dn, fs in _os.walk(t.data_dir) for f in fs if f.endswith(".bloom")
        ]
        live = {_os.path.basename(p) for p in t.manifest().all_files()}
        for b in blooms:
            assert b[: -len(".bloom")] in live, f"orphan sidecar {b}"


class TestBloomVectorizedHash:
    """The numpy build path and the scalar probe path MUST hash
    bit-identically — a divergence would let a sidecar 'prove' absence
    of a present key and silently drop rows from a merge rewrite set."""

    def test_scalar_matches_numpy(self):
        import numpy as np

        from ducklake_kafka_connect_spark.lake.bloom import (
            _hash_pair,
            _int_hash_arrays,
        )

        vals = [0, 1, -1, 5, -5, 2**62, -(2**62), 2**63 - 1, -(2**63), 123456789]
        h1s, h2s = _int_hash_arrays(np.array(vals, dtype=np.int64))
        for v, h1, h2 in zip(vals, h1s.tolist(), h2s.tolist()):
            assert _hash_pair(v) == (h1, h2), f"hash divergence for {v}"

    def test_numpy_built_bloom_probes_scalar(self):
        import numpy as np

        from ducklake_kafka_connect_spark.lake.bloom import (
            bloom_might_contain,
            build_bloom,
        )

        keys = np.arange(0, 50_000, 7, dtype=np.int64) - 1000
        blob = build_bloom(keys)
        assert all(bloom_might_contain(blob, int(v)) for v in keys[:2000])
        # +3 shifts the probe residue class mod 7 → genuinely absent keys
        false_pos = sum(
            bloom_might_contain(blob, int(v)) for v in range(3, 20_000, 7)
        )
        assert false_pos < 40  # fpp ~6e-5 at 20 bits/key

    def test_mixed_int_string_still_works(self):
        from ducklake_kafka_connect_spark.lake.bloom import (
            bloom_might_contain,
            build_bloom,
        )

        blob = build_bloom(list(range(0, 3000, 3)) + ["k1", "k2", None])
        assert all(bloom_might_contain(blob, v) for v in range(0, 3000, 3))
        assert bloom_might_contain(blob, "k1") and bloom_might_contain(blob, "k2")
        assert not bloom_might_contain(blob, "definitely_absent_key_xyz")

    def test_old_format_sidecar_conservatively_kept(self):
        import struct

        from ducklake_kafka_connect_spark.lake.bloom import bloom_might_contain

        old = b"DLBF" + struct.pack("<II", 5, 256) + bytes(32)
        assert bloom_might_contain(old, 42)  # unknown magic → keep


class TestDecimalStats:
    """Decimal footer stats must stay numerically ordered and
    conservative — str(Decimal) would order lexicographically and prune
    wrongly."""

    def test_normalize_is_numeric_and_conservative(self):
        from decimal import Decimal

        from ducklake_kafka_connect_spark.lake.table import _normalize_stat

        lo, hi = _normalize_stat(Decimal("9.10"), Decimal("10.50"))
        assert isinstance(lo, float) and isinstance(hi, float)
        assert lo <= 9.10 and hi >= 10.50
        assert lo < hi  # numeric, not lexicographic

    def test_decimal_table_prunes_correctly(self, spark, tmp_path):
        from decimal import Decimal

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table("dec"), pk=["id"], auto_compact=False)
        rows_a = [(i, Decimal(f"{i}.25")) for i in range(0, 50)]
        rows_b = [(i, Decimal(f"{i}.25")) for i in range(1000, 1050)]
        schema = "id long, amount decimal(10,2)"
        w.append(spark.createDataFrame(rows_a, schema))
        w.append(spark.createDataFrame(rows_b, schema))
        t = cat.table("dec")
        kept, pruned = t.prune_files("amount > 900.0")
        assert pruned >= 1, "low-range file should be pruned"
        got = t.read(where="amount > 900.0").count()
        assert got == 50
        # boundary: a predicate exactly at a stored min must NOT prune it
        assert t.read(where="amount >= 1000.25").count() == 50


class TestNullCountPruning:
    def test_parser_is_null_forms(self):
        cs = parse_conjuncts("a IS NULL AND b IS NOT NULL")
        assert [(c.column, c.op) for c in cs] == [
            ("a", "is_null"),
            ("b", "is_not_null"),
        ]

    def test_is_null_prunes_zero_null_files(self):
        cs = parse_conjuncts("v IS NULL")
        assert not file_matches(cs, {"__rows": 10, "v": [1, 9, 0]})
        assert file_matches(cs, {"__rows": 10, "v": [1, 9, 3]})
        # legacy 2-element stats: unknown null count → keep
        assert file_matches(cs, {"__rows": 10, "v": [1, 9]})

    def test_is_not_null_prunes_all_null_files(self):
        cs = parse_conjuncts("v IS NOT NULL")
        assert not file_matches(cs, {"__rows": 10, "v": [None, None, 10]})
        assert file_matches(cs, {"__rows": 10, "v": [1, 9, 3]})

    def test_comparison_prunes_all_null_files(self):
        # comparisons never match NULL, so an all-NULL column defeats
        # any bound-testable conjunct even without usable min/max
        cs = parse_conjuncts("v = 5")
        assert not file_matches(cs, {"__rows": 10, "v": [None, None, 10]})
        # null-count-only entry with SOME non-nulls: no bounds → keep
        assert file_matches(cs, {"__rows": 10, "v": [None, None, 3]})

    def test_end_to_end_null_pruning(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table("nt"), pk=["id"], auto_compact=False)
        dense = spark.range(0, 100).select(
            F.col("id"), F.col("id").cast("double").alias("v")
        )
        sparse = spark.range(100, 200).select(
            F.col("id"), F.lit(None).cast("double").alias("v")
        )
        w.append(dense)
        w.append(sparse)
        t = cat.table("nt")
        kept, pruned = t.prune_files("v IS NULL")
        assert pruned >= 1, "fully-dense file should be pruned for IS NULL"
        assert t.read(where="v IS NULL").count() == 100
        kept, pruned = t.prune_files("v IS NOT NULL")
        assert pruned >= 1, "all-null file should be pruned for IS NOT NULL"
        assert t.read(where="v IS NOT NULL").count() == 100
        # comparison predicates skip the all-null file too
        kept, pruned = t.prune_files("v > 1000")
        assert pruned >= 1
        assert t.read(where="v > 1000").count() == 0
