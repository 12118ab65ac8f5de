"""SQL function surface: the engine's scalar operators as Spark SQL
temporary functions (``CREATE FUNCTION … RETURN <expression>``).

SQL-expression functions are Catalyst-native — the body inlines into
the calling plan and runs inside whole-stage codegen, unlike Python
UDFs. This is how a SQL-first user of the reference consumes the
operator library: register once per session, then

    SELECT doc_id, dl_token_count(text), dl_lang_id(text)
    FROM documents WHERE dl_quality_stopword_ratio(text) > 0.1

Functions mirror ``operators/text.py`` / ``operators/dedup.py`` /
``functions/timestamps.py`` column builders (same definitions, same
md5-derived hashing — results agree with the DataFrame API and the
DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.dedup import MERSENNE
from ..operators.text import EN_STOPWORDS, LANG_MARKERS

_TOKENS = r"split(trim(lower({t})), '\\s+')"


def _lang_id_expr(t: str) -> str:
    langs = sorted(LANG_MARKERS)
    toks = _TOKENS.format(t=t)
    hit = {
        lang: (
            f"size(filter({toks}, w -> w IN ("
            + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
            + ")))"
        )
        for lang in langs
    }
    best = "greatest(" + ", ".join(hit[lang] for lang in langs) + ")"
    whens = " ".join(
        f"WHEN {hit[lang]} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs
    )
    return f"CASE {whens} ELSE 'und' END"


def sql_functions() -> dict[str, str]:
    """name → CREATE statement (temporary, session-scoped)."""
    toks = _TOKENS.format(t="t")
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    defs = {
        "dl_token_count": f"(t STRING) RETURNS INT RETURN size({toks})",
        "dl_quality_stopword_ratio": (
            f"(t STRING) RETURNS DOUBLE RETURN "
            f"round(cast(size(filter({toks}, w -> w IN ({stop_list}))) AS DOUBLE)"
            f" / size({toks}), 6)"
        ),
        "dl_lang_id": f"(t STRING) RETURNS STRING RETURN {_lang_id_expr('t')}",
        "dl_hash60": (
            "(s STRING) RETURNS BIGINT RETURN "
            "cast(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
        ),
        "dl_minhash_band": (
            # one permuted min-hash over word tokens (doc-level sketch
            # component; a, b passed by the caller)
            f"(t STRING, a BIGINT, b BIGINT) RETURNS BIGINT RETURN "
            f"array_min(transform({toks}, "
            f"w -> (a * (cast(conv(substring(md5(w),1,15),16,10) AS BIGINT)"
            f" % {MERSENNE}) + b) % {MERSENNE}))"
        ),
        "dl_parse_iso_ts": (
            # engine ISO rules: Z / ±hh:mm / compact ±hhmm / naive-as-UTC
            "(s STRING) RETURNS TIMESTAMP RETURN coalesce("
            "try_to_timestamp(s, \"yyyy-MM-dd'T'HH:mm:ssXXX\"), "
            "try_to_timestamp(s, \"yyyy-MM-dd'T'HH:mm:ss.SSSXXX\"), "
            "try_to_timestamp(regexp_replace(s, '([+-][0-9]{2})([0-9]{2})$', '$1:$2'), "
            "\"yyyy-MM-dd'T'HH:mm:ssXXX\"), "
            "try_to_timestamp(s, \"yyyy-MM-dd'T'HH:mm:ss\"), "
            "try_to_timestamp(s, \"yyyy-MM-dd'T'HH:mm:ss.SSS\"))"
        ),
    }
    return {
        name: f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}"
        for name, body in defs.items()
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the dl_* function surface into the session; returns the
    registered names."""
    names = []
    for name, stmt in sql_functions().items():
        spark.sql(stmt)
        names.append(name)
    return names
