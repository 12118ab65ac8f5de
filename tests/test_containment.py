"""containment_pairs vs a brute-force per-pair reference."""

import pytest

from ducklake_kafka_connect_spark.operators.dedup import (
    containment_pairs,
    release_cached,
)

DOCS = [
    # (doc_id, lang, text) — "b" is fully contained in "a" (same 3-grams
    # plus extras), "c" overlaps partially, "d" is a different language
    # block and must never pair with a/b/c, "e" shares nothing.
    (1, "en", "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "en", "alpha beta gamma delta epsilon"),
    (3, "en", "gamma delta epsilon zeta iota kappa"),
    (4, "de", "alpha beta gamma delta epsilon zeta eta theta"),
    (5, "en", "one two three four five six seven"),
]


def _shingles(text, n=3):
    w = text.lower().split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _brute(docs, df_cap=20):
    from collections import Counter

    by_blk = {}
    for doc_id, lang, text in docs:
        by_blk.setdefault(lang, []).append((doc_id, _shingles(text)))
    out = {}
    for blk, items in by_blk.items():
        df = Counter(g for _i, s in items for g in s)
        capped = [(i, {g for g in s if df[g] <= df_cap}) for i, s in items]
        for x in range(len(capped)):
            for y in range(x + 1, len(capped)):
                ia, sa = capped[x]
                ib, sb = capped[y]
                if ia > ib:
                    ia, ib, sa, sb = ib, ia, sb, sa
                inter = len(sa & sb)
                if inter and min(len(sa), len(sb)):
                    out[(ia, ib)] = round(
                        inter / min(len(sa), len(sb)), 6
                    )
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, lang string, text string")


class TestContainment:
    def test_matches_brute_force(self, docs_df):
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(docs_df, top_k=100).collect()
        }
        release_cached()
        assert got == _brute(DOCS)

    def test_full_containment_is_one(self, docs_df):
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(docs_df, top_k=100).collect()
        }
        release_cached()
        assert got[(1, 2)] == 1.0  # doc 2 ⊂ doc 1

    def test_blocks_isolate_languages(self, docs_df):
        got = containment_pairs(docs_df, top_k=100).collect()
        release_cached()
        assert all(
            {r["id_a"], r["id_b"]} != {1, 4} for r in got
        )  # identical text, different lang block

    def test_top_k_truncates_deterministically(self, docs_df):
        one = containment_pairs(docs_df, top_k=1).collect()
        release_cached()
        assert len(one) == 1
        assert (one[0]["id_a"], one[0]["id_b"]) == (1, 2)

    def test_df_cap_drops_stop_shingles(self, spark):
        # the same shingle in every doc, plus one unique pair: with
        # df_cap=2 the common shingle is a stop-shingle, so only the
        # unique overlap contributes
        docs = [
            (i, "en", "stop stop stop unique%d word%d tail" % (i % 2, i % 2))
            for i in range(1, 5)
        ]
        df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(df, top_k=100, df_cap=2).collect()
        }
        release_cached()
        assert got == _brute(docs, df_cap=2)
