"""Curation wave 2: C4-style quality gates, URL canonicalization dedup,
PII redaction accounting — crafted-edge semantics (the driver's DuckDB
oracle pins the full-corpus numbers)."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.plans.curation2 import (
    MIN_WORDS,
    c4_quality_filters,
    pii_redaction_stats,
    url_canonicalize_dedup,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestC4Filters:
    def test_gate_edges(self, spark, tmp_path):
        long_clean = ("the a " + "word " * (MIN_WORDS - 2)).strip()  # passes all
        short_clean = "the a cat"  # fails min-words only
        no_stop = ("zz " * MIN_WORDS).strip()  # fails stopword; mwl=2 fails band
        long_words = ("the a " + "abcdefghij " * MIN_WORDS).strip()  # mwl ~9.7 fails
        sf = _write_docs(
            spark,
            tmp_path,
            [
                (1, long_clean, "en", "s1", len(long_clean)),
                (2, short_clean, "en", "s1", len(short_clean)),
                (3, no_stop, "en", "s2", len(no_stop)),
                (4, long_words, "en", "s2", len(long_words)),
            ],
        )
        got = {r["source"]: r.asDict() for r in c4_quality_filters(spark, sf).collect()}
        assert got["s1"]["n_docs"] == 2
        assert got["s1"]["n_min_words"] == 1  # only the long doc
        assert got["s1"]["n_stopword"] == 2
        assert got["s1"]["n_clean"] == 1
        assert got["s2"]["n_stopword"] == 1  # long_words has the/a
        assert got["s2"]["n_wordlen"] == 0  # 2-char and ~10-char means both out
        assert got["s2"]["n_clean"] == 0

    def test_min_words_boundary_inclusive(self, spark, tmp_path):
        exactly = ("the a " + "w " * (MIN_WORDS - 2)).strip()
        one_less = ("the a " + "w " * (MIN_WORDS - 3)).strip()
        sf = _write_docs(
            spark,
            tmp_path,
            [(1, exactly, "en", "s", 1), (2, one_less, "en", "s", 1)],
        )
        row = c4_quality_filters(spark, sf).collect()[0]
        assert row["n_min_words"] == 1


class TestUrlCanonicalize:
    def test_tracking_variants_collapse(self, spark, tmp_path):
        # doc_ids congruent mod 50 share a path; different utm_* params
        # and host case must collapse to one canonical URL
        rows = [(i, "t", "en", "srcA", 1) for i in (0, 150, 300, 450)]
        rows += [(7, "t", "en", "srcB", 1)]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r["source"]: r.asDict() for r in url_canonicalize_dedup(spark, sf).collect()}
        # path p/0 for all four srcA docs; params differ (mod 3 / mod 4 / mod 2)
        assert got["srcA"]["n_urls"] == 4
        assert got["srcA"]["n_canonical"] == 2  # page= param survives: 0,150,300,450 → page 0,2,0,2
        assert got["srcB"]["n_urls"] == 1 and got["srcB"]["n_canonical"] == 1
        assert got["srcB"]["dup_rate_micro"] == 0

    def test_canonical_form_is_lowercase_no_utm(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            _DANGLING_Q,
            _URL_SQL,
            _UTM_LEAD,
            _UTM_MID,
        )

        sf = _write_docs(spark, tmp_path, [(12, "t", "en", "Mixed", 1)])
        df = spark.read.parquet(sf + "/documents.parquet").select(
            F.expr(_URL_SQL.format(int_t="STRING")).alias("url")
        )
        curl = df.select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col("url")), _UTM_MID, ""),
                    _UTM_LEAD,
                    "?",
                ),
                _DANGLING_Q,
                "",
            ).alias("c")
        ).collect()[0]["c"]
        # url for doc 12: .../p/12?utm_source=s0&page=0&utm_campaign=c0
        assert curl == "https://mixed.example.com/p/12?page=0"
        assert "utm" not in curl and curl == curl.lower()


class TestPiiRedaction:
    def test_counts_and_redacted_chars(self, spark, tmp_path):
        # doc_id 0: email+ip (0%5=0, 0%7=0, 0%11=0 → all three)
        # doc_id 3: none; doc_id 5: email only; doc_id 7: ip only
        sf = _write_docs(
            spark,
            tmp_path,
            [(i, "base text", "en", "s", 1) for i in (0, 3, 5, 7)],
        )
        row = pii_redaction_stats(spark, sf).collect()[0]
        assert row["n_emails"] == 2  # doc 0 and doc 5
        assert row["n_ips"] == 2  # doc 0 and doc 7
        assert row["n_phones"] == 1  # doc 0 only
        assert row["n_docs_with_pii"] == 3
        # redaction removes exactly the matched spans
        assert row["redacted_chars"] == (
            len("user0@mail.example.com") + len("user5@mail.example.com")
            + len("10.0.0.25") + len("10.0.7.25") + len("+1-555-0000")
        )

    def test_no_pii_docs_zero(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, [(3, "plain", "en", "s", 1)])
        row = pii_redaction_stats(spark, sf).collect()[0]
        assert (
            row["n_emails"] == row["n_ips"] == row["n_phones"]
            == row["redacted_chars"] == row["n_docs_with_pii"] == 0
        )


class TestSplitLeakage:
    @staticmethod
    def _split_of(doc_id: int) -> str:
        import hashlib

        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100
        return "train" if h < 90 else ("val" if h < 95 else "test")

    def test_assignment_stable_and_leak_counts(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            dataset_split_leakage,
        )

        # find one doc id per split bucket, then plant exact dups
        ids = list(range(200))
        by_split = {}
        for i in ids:
            by_split.setdefault(self._split_of(i), []).append(i)
        tr, va = by_split["train"][0], by_split["val"][0]
        tr2 = by_split["train"][1]
        rows = [(i, f"uniq {i}", "en", "s", 1) for i in ids]
        rows[tr] = (tr, "DUPTEXT", "en", "s", 1)
        rows[va] = (va, "DUPTEXT", "en", "s", 1)   # cross-split pair
        rows[tr2] = (tr2, "DUPTEXT", "en", "s", 1)  # adds within + cross
        sf = _write_docs(spark, tmp_path, rows)
        got = {r["split"]: r.asDict() for r in dataset_split_leakage(spark, sf).collect()}
        expected_counts = {k: len(v) for k, v in by_split.items()}
        assert {k: got[k]["n_docs"] for k in got} == expected_counts
        # pairs among {tr, tr2, va}: (tr,tr2) within, (tr,va)+(tr2,va) cross
        assert got["train"]["n_cross_split_dup_pairs"] == 2
        assert got["train"]["n_within_split_dup_pairs"] == 1

    def test_no_dups_zero_leakage(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            dataset_split_leakage,
        )

        sf = _write_docs(
            spark, tmp_path, [(i, f"u {i}", "en", "s", 1) for i in range(50)]
        )
        for r in dataset_split_leakage(spark, sf).collect():
            assert r["n_cross_split_dup_pairs"] == 0
            assert r["n_within_split_dup_pairs"] == 0


class TestContextPacking:
    def test_offset_packing_accounting(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            CTX_TOKENS,
            context_packing_stats,
        )

        # token counts 300, 300, 512 (capped from 600) → starts 0, 300, 600
        # → packs 0, 0, 1
        rows = [
            (0, "w " * 300, "en", "s", 1),
            (1, "w " * 300, "en", "s", 1),
            (2, "w " * 600, "en", "s", 1),  # capped to CTX_TOKENS
        ]
        sf = _write_docs(spark, tmp_path, [(i, t.strip(), l, s, n) for i, t, l, s, n in rows])
        row = context_packing_stats(spark, sf).collect()[0]
        assert row["n_packs"] == 2
        assert row["n_docs"] == 3
        assert row["total_tokens"] == 300 + 300 + CTX_TOKENS
        assert row["max_docs_per_pack"] == 2 and row["min_docs_per_pack"] == 1
        assert row["fill_rate_micro"] == (1_000_000 * 1112) // (2 * CTX_TOKENS)

    def test_bucket_boundary_parity(self, spark, tmp_path):
        """Docs straddling the 10k-doc_id bucket boundary must pack as if
        the cumsum were global (the two-pass offsets compose exactly)."""
        from ducklake_kafka_connect_spark.plans.curation2 import (
            context_packing_stats,
        )

        rows = [(i, "w " * 100, "en", "s", 1) for i in (9_998, 9_999, 10_000, 10_001)]
        sf = _write_docs(spark, tmp_path, [(i, t.strip(), l, s, n) for i, t, l, s, n in rows])
        row = context_packing_stats(spark, sf).collect()[0]
        # starts 0,100,200,300 → all < 512 → one pack of four docs
        assert row["n_packs"] == 1 and row["n_docs"] == 4
        assert row["total_tokens"] == 400


class TestPercentilesAndSweep:
    def test_exact_disc_percentiles(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            length_percentiles_by_lang,
        )

        # en: n_chars 10..19 (10 docs) → p50 pos = (9*50)//100+1 = 5 → 14
        # p90 pos = (9*90)//100+1 = 9 → 18; p99 pos = (9*99)//100+1 = 9 → 18
        rows = [(i, "t", "en", "s", 10 + i) for i in range(10)]
        rows += [(100, "t", "fr", "s", 7)]  # single-doc lang: all pcts = 7
        sf = _write_docs(spark, tmp_path, rows)
        got = {r["lang"]: r.asDict() for r in length_percentiles_by_lang(spark, sf).collect()}
        assert got["en"]["n_docs"] == 10
        assert got["en"]["p50_chars"] == 14
        assert got["en"]["p90_chars"] == 18 and got["en"]["p99_chars"] == 18
        assert got["fr"]["p50_chars"] == got["fr"]["p99_chars"] == 7

    def test_threshold_sweep_monotone_and_exact(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            _SWEEP_THRESHOLDS,
            filter_threshold_sweep,
        )

        # mwl 2.0 (fails all), 4.0 (passes <=4.0M), 10.0 (passes all)
        rows = [
            (1, "ab cd ef gh", "en", "s", 1),        # mwl 2.0
            (2, "abcd efgh ijkl", "en", "s", 1),      # mwl 4.0
            (3, "abcdefghij klmnopqrst", "en", "s", 1),  # mwl 10.0
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r["threshold"]: r.asDict() for r in filter_threshold_sweep(spark, sf).collect()}
        assert set(got) == set(_SWEEP_THRESHOLDS)
        assert got[3_000_000]["docs_retained"] == 2
        assert got[4_000_000]["docs_retained"] == 2
        assert got[4_500_000]["docs_retained"] == 1
        assert got[6_000_000]["docs_retained"] == 1
        assert got[4_000_000]["tokens_retained"] == 3 + 2
        # retention is monotone non-increasing in the threshold
        vals = [got[t]["docs_retained"] for t in sorted(got)]
        assert vals == sorted(vals, reverse=True)
        assert got[3_000_000]["retention_micro"] == (1_000_000 * 2) // 3


class TestWave4:
    def test_cross_source_prefix_dups(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            cross_source_dup_matrix,
        )

        shared = "alpha beta gamma delta epsilon zeta ending varies here"
        rows = [
            (1, shared, "en", "srcA", 1),
            (2, shared + " differently", "en", "srcB", 1),  # same 6-word prefix
            (3, shared + " again and again", "en", "srcC", 1),
            (4, "totally different opening words right here", "en", "srcB", 1),
            (5, shared, "en", "srcA", 1),  # same-source dup: excluded
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {
            (r["source_lo"], r["source_hi"]): r["n_dup_pairs"]
            for r in cross_source_dup_matrix(spark, sf).collect()
        }
        # cross-source prefix pairs among docs 1,2,3,5: (1,2),(1,3),(2,3),(2,5),(3,5)
        assert got == {
            ("srcA", "srcB"): 2,
            ("srcA", "srcC"): 2,
            ("srcB", "srcC"): 1,
        }

    def test_token_histogram_buckets(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            token_count_histogram,
        )

        rows = [
            (1, "w", "en", "s", 1),            # 1 token → bucket 0
            (2, "a b c", "en", "s", 1),        # 3 → bucket 1
            (3, "a b c d", "en", "s", 1),      # 4 → bucket 2
            (4, ("w " * 9).strip(), "en", "s", 1),   # 9 → bucket 3
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r["bucket"]: r.asDict() for r in token_count_histogram(spark, sf).collect()}
        assert set(got) == {0, 1, 2, 3}
        assert got[0]["bucket_lo"] == 1 and got[0]["n_docs"] == 1
        assert got[1]["min_tok"] == 3 and got[1]["max_tok"] == 3
        assert got[2]["bucket_lo"] == 4
        assert got[3]["total_tokens"] == 9


class TestFunnelAndAblation:
    def _corpus(self, spark, tmp_path):
        # crafted per-gate casualties, each failing EXACTLY ONE gate so
        # funnel attrition AND ablation unique-loss are both 1 per gate:
        # d1 min-words only (short but in-band, stopworded, distinct);
        # d2 stopwords only (30 distinct words, mean 4.5 chars);
        # d3 word-length band only (30 distinct 10-char words);
        # d4 uniq-ratio only (two words repeated, mean in band);
        # d5 passes everything
        from ducklake_kafka_connect_spark.plans.curation2 import (
            FUNNEL_MIN_WORDS as MW,
        )

        five = " ".join(f"abcd{i}" for i in range(10))            # 5-char words
        mix45 = " ".join(                                          # mean 4.5
            (f"a{i:03d}" if i % 2 else f"bb{i:03d}") for i in range(MW)
        )
        longw = " ".join(f"abcdefgh{i:02d}" for i in range(MW))    # 10-char words
        rep = "abcd efghi " * (MW * 2)                             # 2 distinct, mean 4.5
        passing = " ".join(f"wrd{i}" for i in range(MW - 2))
        rows = [
            (1, f"the a {five}", "en", "s1", 1),
            (2, mix45, "en", "s1", 1),
            (3, f"the a {longw}", "en", "s1", 1),
            (4, ("the a " + rep).strip(), "en", "s1", 1),
            (5, f"the a {passing}", "en", "s1", 1),
        ]
        return _write_docs(spark, tmp_path, rows)

    def test_funnel_order_and_attrition(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            curation_funnel_attrition,
        )

        sf = self._corpus(spark, tmp_path)
        rows = sorted(
            (r.asDict() for r in curation_funnel_attrition(spark, sf).collect()),
            key=lambda r: r["gate_idx"],
        )
        assert [r["gate"] for r in rows] == [
            "min_words", "stopwords", "word_len", "uniq_ratio",
        ]
        # chained accounting: stage k's input is stage k-1's survivors
        for prev, cur in zip(rows, rows[1:]):
            assert cur["docs_in"] == prev["docs_out"]
            assert cur["tokens_in"] == prev["tokens_out"]
        # each crafted doc dies at its designated gate
        assert [r["docs_in"] for r in rows] == [5, 4, 3, 2]
        assert [r["docs_out"] for r in rows] == [4, 3, 2, 1]
        for r in rows:
            assert 0 <= r["tokens_out"] <= r["tokens_in"]

    def test_ablation_marginals(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.plans.curation2 import (
            curation_funnel_attrition,
            gate_ablation_matrix,
        )

        sf = self._corpus(spark, tmp_path)
        ab = {r["gate"]: r.asDict() for r in gate_ablation_matrix(spark, sf).collect()}
        funnel = sorted(
            (r.asDict() for r in curation_funnel_attrition(spark, sf).collect()),
            key=lambda r: r["gate_idx"],
        )
        survivors = funnel[-1]["docs_out"]
        for g, r in ab.items():
            assert r["docs_all"] == survivors, g
            assert r["docs_without"] >= r["docs_all"], g
            assert r["docs_unique_loss"] == r["docs_without"] - r["docs_all"]
            assert r["tokens_unique_loss"] == r["tokens_without"] - r["tokens_all"]
        # every crafted casualty is uniquely attributable to ONE gate
        assert {g: r["docs_unique_loss"] for g, r in ab.items()} == {
            "min_words": 1, "stopwords": 1, "word_len": 1, "uniq_ratio": 1,
        }
