"""Round-9 wave: web-corpus curation operators.

Four beyond-parity operators from the published large-corpus curation
playbooks (Gopher/MassiveText, DSIR, CCNet/RefinedWeb) — the filtering
and mixing stages a 100 TB training-data pipeline runs between ingest
(the reference connector's job, `DucklakeSinkTask.java`) and training:

- ``gopher_repetition_suite`` — the MassiveText repetition filters
  (Rae et al. 2021, table A1): per-document fraction of characters in
  the most frequent word 2-gram / 3-gram, and fraction of characters
  covered by word 5-grams repeated within the document, rolled up per
  language with flagged-document counts at the paper's thresholds.
- ``dsir_importance_weights`` — Data Selection via Importance
  Resampling (Xie et al. 2023): hashed-unigram bucket counts estimate
  target (here: lang='en') and raw corpus distributions; each document
  scores the mean per-token log importance ratio. The model state is
  B=64 integers per distribution — a broadcast literal at any scale.
- ``domain_cap_sample`` — per-domain document caps (CCNet/RefinedWeb
  style): deterministic md5-ordered rank within each source, keep the
  first CAP docs; per-source kept/dropped/byte accounting.
- ``source_kl_drift`` — per-source KL divergence of the unigram
  distribution against the corpus distribution over the top-V corpus
  vocabulary (Laplace-smoothed) — the mixture-health monitor that
  flags a source drifting away from the corpus it feeds.

Determinism contract (same as plans/queries.py): hashes derive from
md5 (``h60``), ratios integerize per row with FLOOR (tie-mode-free)
into integer micros before any aggregation, log terms integerize to
micro-nats with the ROUND convention ``_micronats_sql`` established.
Where the reference is cited it is for scope parity only — the
reference delegates all querying to DuckDB (SURVEY §2.G).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import WORDS_SQL, h60_col, h60_sql
from .corpus_stats import TOKEN_SPLIT
from .queries import _t, register
from ..lake.relation_cache import local_rows_df

# Gopher/MassiveText table A1 thresholds, in integer micros.
TOP2_FLAG_MICRO = 200_000  # top 2-gram > 0.20 of chars
TOP3_FLAG_MICRO = 180_000  # top 3-gram > 0.18 of chars
DUP5_FLAG_MICRO = 150_000  # chars inside duplicated 5-grams > 0.15

DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"

DOMAIN_CAP = 15

KL_VOCAB = 100

_TOK_CTE = f"""
    split AS (
      SELECT doc_id, lang, source, {WORDS_SQL.format(text="text")} AS w
      FROM documents
    ),
    tok AS (
      SELECT doc_id, lang, source,
             unnest(generate_series(1, len(w))) AS pos,
             unnest(w) AS word
      FROM split
    )"""


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, pos, word) with 1-based positions —
    matches the SQL CTE's zipped generate_series/unnest exactly."""
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    return (
        docs.repartition(n_part, "doc_id")
        .select(
            "doc_id", "lang", "source", F.posexplode(words).alias("p0", "word")
        )
        .select(
            "doc_id",
            "lang",
            "source",
            (F.col("p0") + F.lit(1)).alias("pos"),
            "word",
        )
    )


def _floor_micro_sql(num: str, den: str) -> str:
    # FLOOR is exact on doubles, so unlike ROUND it has no tie mode to
    # disagree on; the quotient double is bit-identical in both engines.
    return f"CAST(FLOOR({num} * 1000000.0 / {den}) AS BIGINT)"


def _floor_micro_col(num: F.Column, den: F.Column) -> F.Column:
    return F.floor(num * F.lit(1000000.0) / den).cast("long")


# ---------------------------------------------------------------------------
# Gopher repetition suite
# ---------------------------------------------------------------------------


@register(
    "gopher_repetition_suite",
    f"""
    WITH {_TOK_CTE},
    base AS (
      SELECT doc_id, lang, CAST(sum(length(word)) AS BIGINT) AS total_chars
      FROM tok GROUP BY doc_id, lang
    ),
    seq AS (
      SELECT doc_id, pos, word,
             lead(word, 1) OVER d AS w2,
             lead(word, 2) OVER d AS w3,
             lead(word, 3) OVER d AS w4,
             lead(word, 4) OVER d AS w5
      FROM tok WINDOW d AS (PARTITION BY doc_id ORDER BY pos)
    ),
    bg AS (
      SELECT doc_id, word || ' ' || w2 AS g,
             length(word) + length(w2) AS g_chars
      FROM seq WHERE w2 IS NOT NULL
    ),
    bg_top AS (
      SELECT doc_id, cnt * g_chars AS top2_chars FROM (
        SELECT doc_id, g, g_chars, count(*) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC, g ASC) AS rn
        FROM bg GROUP BY doc_id, g, g_chars) t
      WHERE rn = 1
    ),
    tg AS (
      SELECT doc_id, word || ' ' || w2 || ' ' || w3 AS g,
             length(word) + length(w2) + length(w3) AS g_chars
      FROM seq WHERE w3 IS NOT NULL
    ),
    tg_top AS (
      SELECT doc_id, cnt * g_chars AS top3_chars FROM (
        SELECT doc_id, g, g_chars, count(*) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC, g ASC) AS rn
        FROM tg GROUP BY doc_id, g, g_chars) t
      WHERE rn = 1
    ),
    win5 AS (
      SELECT doc_id, pos,
             {h60_sql("word || ' ' || w2 || ' ' || w3 || ' ' || w4 || ' ' || w5")}
               AS wh
      FROM seq WHERE w5 IS NOT NULL
    ),
    dup5 AS (
      SELECT doc_id, wh FROM (
        SELECT doc_id, wh, count(*) AS c FROM win5 GROUP BY doc_id, wh) t
      WHERE c >= 2
    ),
    cov0 AS (
      SELECT w.doc_id, unnest(generate_series(w.pos, w.pos + 4)) AS cpos
      FROM win5 w JOIN dup5 d ON w.doc_id = d.doc_id AND w.wh = d.wh
    ),
    cov AS (SELECT DISTINCT doc_id, cpos FROM cov0),
    dupc AS (
      SELECT t.doc_id, CAST(sum(length(t.word)) AS BIGINT) AS dup5_chars
      FROM tok t JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
      GROUP BY t.doc_id
    ),
    perdoc AS (
      SELECT b.lang,
             {_floor_micro_sql("COALESCE(t2.top2_chars, 0)", "b.total_chars")}
               AS top2_micro,
             {_floor_micro_sql("COALESCE(t3.top3_chars, 0)", "b.total_chars")}
               AS top3_micro,
             {_floor_micro_sql("COALESCE(d.dup5_chars, 0)", "b.total_chars")}
               AS dup5_micro
      FROM base b
      LEFT JOIN bg_top t2 USING (doc_id)
      LEFT JOIN tg_top t3 USING (doc_id)
      LEFT JOIN dupc d USING (doc_id)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(top2_micro) AS BIGINT) AS sum_top2_micro,
           CAST(max(top2_micro) AS BIGINT) AS max_top2_micro,
           CAST(sum(CASE WHEN top2_micro > {TOP2_FLAG_MICRO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flag_top2,
           CAST(sum(CASE WHEN top3_micro > {TOP3_FLAG_MICRO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flag_top3,
           CAST(sum(dup5_micro) AS BIGINT) AS sum_dup5_micro,
           CAST(sum(CASE WHEN dup5_micro > {DUP5_FLAG_MICRO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flag_dup5
    FROM perdoc GROUP BY lang ORDER BY lang
    """,
    "MassiveText repetition filters (Rae et al. 2021): per-doc char "
    "share of the most frequent 2-/3-gram and of within-doc duplicated "
    "5-grams (position-coverage, no double counting), per-lang rollup "
    "with flagged-doc counts at the paper's thresholds",
)
def gopher_repetition_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All heavy frames share the doc_id partitioning the first window
    establishes: the lead() chain, both per-doc top-n-gram groupBys,
    the duplicated-window groupBy, and the coverage join are doc-local,
    so after the initial repartition NOTHING re-shuffles by a different
    key — per-doc state is bounded by doc length, never corpus size.
    The 5-gram key is a 60-bit md5 (8-byte shuffle key), not the
    5-word string. Position-coverage dedups overlapping duplicated
    windows exactly (Gopher counts each character once)."""
    tok = _tok(spark, sf_dir).drop("source")
    tok.persist()
    base = tok.groupBy("doc_id", "lang").agg(
        F.sum(F.length("word")).cast("long").alias("total_chars")
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    seq = tok.select(
        "doc_id",
        "pos",
        "word",
        F.lead("word", 1).over(win).alias("w2"),
        F.lead("word", 2).over(win).alias("w3"),
        F.lead("word", 3).over(win).alias("w4"),
        F.lead("word", 4).over(win).alias("w5"),
    )
    seq.persist()

    def top_ngram(cols: list[str], out: str) -> DataFrame:
        g = F.concat_ws(" ", *cols).alias("g")
        chars = sum(
            (F.length(c) for c in cols[1:]), F.length(cols[0])
        ).alias("g_chars")
        grams = seq.filter(F.col(cols[-1]).isNotNull()).select(
            "doc_id", g, chars
        )
        counted = grams.groupBy("doc_id", "g", "g_chars").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wtop = W.partitionBy("doc_id").orderBy(
            F.col("cnt").desc(), F.col("g").asc()
        )
        return (
            counted.withColumn("rn", F.row_number().over(wtop))
            .filter(F.col("rn") == 1)
            .select("doc_id", (F.col("cnt") * F.col("g_chars")).alias(out))
        )

    bg_top = top_ngram(["word", "w2"], "top2_chars")
    tg_top = top_ngram(["word", "w2", "w3"], "top3_chars")
    win5 = seq.filter(F.col("w5").isNotNull()).select(
        "doc_id",
        "pos",
        h60_col(F.concat_ws(" ", "word", "w2", "w3", "w4", "w5")).alias("wh"),
    )
    dup5 = (
        win5.groupBy("doc_id", "wh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("doc_id", "wh")
    )
    cov = (
        win5.join(dup5, ["doc_id", "wh"])
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(4))
            ).alias("pos"),
        )
        .distinct()
    )
    dupc = (
        tok.join(cov, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.sum(F.length("word")).cast("long").alias("dup5_chars"))
    )
    zero = F.lit(0)
    perdoc = (
        base.join(bg_top, "doc_id", "left")
        .join(tg_top, "doc_id", "left")
        .join(dupc, "doc_id", "left")
        .select(
            "lang",
            _floor_micro_col(
                F.coalesce(F.col("top2_chars"), zero), F.col("total_chars")
            ).alias("top2_micro"),
            _floor_micro_col(
                F.coalesce(F.col("top3_chars"), zero), F.col("total_chars")
            ).alias("top3_micro"),
            _floor_micro_col(
                F.coalesce(F.col("dup5_chars"), zero), F.col("total_chars")
            ).alias("dup5_micro"),
        )
    )
    flag = lambda c, t: F.sum(  # noqa: E731
        F.when(F.col(c) > t, 1).otherwise(0)
    ).cast("long")
    out = (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("top2_micro").cast("long").alias("sum_top2_micro"),
            F.max("top2_micro").cast("long").alias("max_top2_micro"),
            flag("top2_micro", TOP2_FLAG_MICRO).alias("n_flag_top2"),
            flag("top3_micro", TOP3_FLAG_MICRO).alias("n_flag_top3"),
            F.sum("dup5_micro").cast("long").alias("sum_dup5_micro"),
            flag("dup5_micro", DUP5_FLAG_MICRO).alias("n_flag_dup5"),
        )
        .orderBy("lang")
    )
    return out


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


@register(
    "dsir_importance_weights",
    f"""
    WITH {_TOK_CTE},
    btok AS (
      SELECT doc_id, lang, {h60_sql("word")} % {DSIR_BUCKETS} AS b FROM tok
    ),
    raw AS (SELECT b, count(*) AS c_r FROM btok GROUP BY b),
    tgt AS (
      SELECT b, count(*) AS c_t FROM btok
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_r,
             CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_t
      FROM btok
    ),
    lr AS (
      SELECT r.b,
             CAST(ROUND(ln(((COALESCE(t.c_t, 0) + 1.0) * (tot.n_r + {DSIR_BUCKETS}))
                          / ((r.c_r + 1.0) * (tot.n_t + {DSIR_BUCKETS})))
                        * 1000000) AS BIGINT) AS lr_micro
      FROM raw r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN tot
    ),
    dw AS (
      SELECT bt.doc_id, bt.lang,
             CAST(sum(lr.lr_micro) AS BIGINT) AS w_micro,
             count(*) AS n_tok
      FROM btok bt JOIN lr ON bt.b = lr.b GROUP BY bt.doc_id, bt.lang
    ),
    perdoc AS (
      SELECT lang,
             CAST(FLOOR(w_micro * 1.0 / n_tok) AS BIGINT) AS w_tok_micro
      FROM dw
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN w_tok_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           CAST(sum(w_tok_micro) AS BIGINT) AS sum_w_micro,
           CAST(min(w_tok_micro) AS BIGINT) AS min_w_micro,
           CAST(max(w_tok_micro) AS BIGINT) AS max_w_micro
    FROM perdoc GROUP BY lang ORDER BY lang
    """,
    "DSIR (Xie et al. 2023): hashed-unigram importance weights — "
    f"{DSIR_BUCKETS}-bucket target (lang='{DSIR_TARGET_LANG}') vs raw "
    "distributions, per-doc mean per-token log ratio in micro-nats, "
    "per-lang selection accounting",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR model is 2×64 bucket counts + 2 scalars: the log-ratio
    table is a 64-row broadcast, so scoring is ONE linear pass over
    tokens with a map-side join — no shuffle grows with corpus size
    except the per-doc sum, which is doc_id-partitioned. ln parity and
    the ROUND micro-nat convention follow plans/corpus_stats.py."""
    tok = _tok(spark, sf_dir).drop("source", "pos")
    btok = tok.select(
        "doc_id", "lang", (h60_col(F.col("word")) % DSIR_BUCKETS).alias("b")
    )
    btok.persist()
    raw = btok.groupBy("b").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        btok.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tot = btok.agg(
        F.count(F.lit(1)).cast("long").alias("n_r"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
    )
    nb = F.lit(float(DSIR_BUCKETS))
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1.0))
                     * (F.col("n_r") + nb))
                    / ((F.col("c_r") + F.lit(1.0)) * (F.col("n_t") + nb))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    dw = (
        btok.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("lr_micro").cast("long").alias("w_micro"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    perdoc = dw.select(
        "lang",
        F.floor(F.col("w_micro") * F.lit(1.0) / F.col("n_tok"))
        .cast("long")
        .alias("w_tok_micro"),
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("w_tok_micro") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
            F.sum("w_tok_micro").cast("long").alias("sum_w_micro"),
            F.min("w_tok_micro").cast("long").alias("min_w_micro"),
            F.max("w_tok_micro").cast("long").alias("max_w_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Per-domain caps
# ---------------------------------------------------------------------------


@register(
    "domain_cap_sample",
    f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {h60_sql("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
             ) AS rn
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rn > {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM ranked GROUP BY source ORDER BY source
    """,
    f"Per-domain document caps (CCNet/RefinedWeb): md5-ordered rank "
    f"within source, keep the first {DOMAIN_CAP} — per-source "
    "kept/dropped/char accounting, RNG-free and content-stable",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One window over the source partitioning, one aggregate on the
    same key — a single exchange end-to-end. At 100 TB the hot risk is
    a mega-domain skewing the rank window; because only rank ≤ CAP
    survives, the production form pre-filters with a per-partition
    partial top-CAP (TakeOrdered semantics) before the global rank —
    the accounting columns here keep the full counts, which stay a
    per-source aggregate, never a per-doc sort."""
    docs = _t(spark, sf_dir, "documents")
    win = W.partitionBy("source").orderBy(
        h60_col(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(win).alias("rn")
    )
    kept = F.col("rn") <= DOMAIN_CAP
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Per-source KL drift
# ---------------------------------------------------------------------------


@register(
    "source_kl_drift",
    f"""
    WITH {_TOK_CTE},
    cc AS (SELECT word, count(*) AS c_c FROM tok GROUP BY word),
    vocab AS (
      SELECT word, c_c FROM cc ORDER BY c_c DESC, word ASC LIMIT {KL_VOCAB}
    ),
    nc AS (SELECT CAST(sum(c_c) AS BIGINT) AS n_c FROM vocab),
    sc AS (
      SELECT t.source, t.word, count(*) AS c_s
      FROM tok t JOIN vocab v ON t.word = v.word
      GROUP BY t.source, t.word
    ),
    ns AS (
      SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM sc GROUP BY source
    ),
    grid AS (
      SELECT s.source, v.c_c, COALESCE(c.c_s, 0) AS c_s, s.n_s
      FROM ns s CROSS JOIN vocab v
      LEFT JOIN sc c ON c.source = s.source AND c.word = v.word
    ),
    contrib AS (
      SELECT source, n_s,
             CAST(ROUND(((c_s + 1.0) / (n_s + {KL_VOCAB}))
                        * ln(((c_s + 1.0) * (nc.n_c + {KL_VOCAB}))
                             / ((c_c + 1.0) * (n_s + {KL_VOCAB})))
                        * 1000000) AS BIGINT) AS k_micro
      FROM grid CROSS JOIN nc
    )
    SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens_top,
           CAST(sum(k_micro) AS BIGINT) AS kl_micro
    FROM contrib GROUP BY source ORDER BY source
    """,
    f"Per-source unigram KL divergence vs the corpus over the top-"
    f"{KL_VOCAB} vocabulary (Laplace-smoothed, per-term contributions "
    "integerized to micro-nats) — the data-mixture drift monitor",
)
def source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State is |sources| × V rows (the grid) — independent of corpus
    size; the token stream is exploded and shuffled ONCE, into
    (source, word) partial counts (map-side combined), and every later
    frame derives from that ~|sources|·|vocab|-sized aggregate: corpus
    counts are a re-aggregation, not a second scan. Per-term
    contributions integerize before the sum, so the KL ranking is
    exact in both engines. Association order of the double product
    mirrors the SQL's left-assoc parse exactly."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    sw_counts = (
        docs.select("source", F.explode(words).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c_s"))
    )
    sw_counts.persist()
    # vocab is a bounded planning aggregate (≤KL_VOCAB rows): holding
    # it on the driver — the kmeans-centroid convention — turns every
    # later reference into a literal instead of a recomputed+broadcast
    # subtree (3 broadcasts and their jobs collapse into one collect)
    vrows = (
        sw_counts.groupBy("word")
        .agg(F.sum("c_s").alias("c_c"))
        .orderBy(F.col("c_c").desc(), F.col("word").asc())
        .limit(KL_VOCAB)
        .collect()
    )
    vocab = local_rows_df(spark, 
        [(r["word"], int(r["c_c"])) for r in vrows], "word string, c_c long"
    )
    nc_val = float(sum(int(r["c_c"]) for r in vrows))
    sc = sw_counts.join(F.broadcast(vocab.select("word")), "word").select(
        "source", "word", "c_s"
    )
    ns = sc.groupBy("source").agg(F.sum("c_s").cast("long").alias("n_s"))
    grid = (
        ns.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "word"], "left")
        .select(
            "source",
            "c_c",
            F.coalesce(F.col("c_s"), F.lit(0)).alias("c_s"),
            "n_s",
        )
    )
    kv = F.lit(float(KL_VOCAB))
    contrib = grid.select(
        "source",
        "n_s",
        F.round(
            ((F.col("c_s") + F.lit(1.0)) / (F.col("n_s") + kv))
            * F.log(
                ((F.col("c_s") + F.lit(1.0)) * (F.lit(nc_val) + kv))
                / ((F.col("c_c") + F.lit(1.0)) * (F.col("n_s") + kv))
            )
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("k_micro"),
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens_top"),
            F.sum("k_micro").cast("long").alias("kl_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Data recipe: token-budget epoch planning
# ---------------------------------------------------------------------------

RECIPE_BUDGET_TOKENS = 10_000_000  # target training-token budget
RECIPE_ALPHA_NOTE = "weights ∝ sqrt(lang token count), the alpha=0.5 convention"


@register(
    "data_recipe_epochs",
    f"""
    WITH split AS (
      SELECT doc_id, lang, {WORDS_SQL.format(text="text")} AS w
      FROM documents
    ),
    lt AS (
      SELECT lang, CAST(sum(len(w)) AS BIGINT) AS n_tokens
      FROM split GROUP BY lang
    ),
    sw AS (
      SELECT lang, n_tokens,
             CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT)
               AS weight_milli
      FROM lt
    ),
    tot AS (SELECT CAST(sum(weight_milli) AS BIGINT) AS s FROM sw),
    q AS (
      SELECT lang, n_tokens, weight_milli,
             CAST(FLOOR({RECIPE_BUDGET_TOKENS} * weight_milli * 1.0 / tot.s)
                  AS BIGINT) AS quota_tokens
      FROM sw CROSS JOIN tot
    )
    SELECT lang, n_tokens, weight_milli, quota_tokens,
           CAST(CEIL(quota_tokens * 1.0 / n_tokens) AS BIGINT) AS epochs,
           CAST(FLOOR(quota_tokens * 1000000.0 / n_tokens) AS BIGINT)
             AS repetition_micro
    FROM q ORDER BY lang
    """,
    f"Training data recipe: per-language token quotas under a "
    f"{RECIPE_BUDGET_TOKENS}-token budget ({RECIPE_ALPHA_NOTE}), epochs "
    "needed and effective repetition factor — integer-exact (per-row "
    "sqrt integerized to milli before any cross-row sum)",
)
def data_recipe_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One linear pass counts tokens per language; everything after is
    |langs|-row arithmetic against a broadcast 1-row total. Per-row
    sqrt integerizes to milli-units BEFORE the cross-row sum, so no
    float addition order can differ between engines; quotas and
    repetition factors are pure BIGINT division."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    lt = (
        docs.select("lang", F.size(words).alias("n"))
        .groupBy("lang")
        .agg(F.sum("n").cast("long").alias("n_tokens"))
    )
    sw = lt.select(
        "lang",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000)
        .cast("long")
        .alias("weight_milli"),
    )
    tot = sw.agg(F.sum("weight_milli").cast("long").alias("s"))
    budget = F.lit(RECIPE_BUDGET_TOKENS).cast("long")
    q = sw.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        "weight_milli",
        F.floor(budget * F.col("weight_milli") * F.lit(1.0) / F.col("s"))
        .cast("long")
        .alias("quota_tokens"),
    )
    return q.select(
        "lang",
        "n_tokens",
        "weight_milli",
        "quota_tokens",
        F.ceil(F.col("quota_tokens") * F.lit(1.0) / F.col("n_tokens"))
        .cast("long")
        .alias("epochs"),
        F.floor(F.col("quota_tokens") * F.lit(1000000.0) / F.col("n_tokens"))
        .cast("long")
        .alias("repetition_micro"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Data recipe MATERIALIZATION: quotas → the mixed corpus, one gate pass
# ---------------------------------------------------------------------------


@register(
    "recipe_materialize_mix",
    f"""
    WITH split AS (
      SELECT doc_id, lang, len({WORDS_SQL.format(text="text")}) AS n
      FROM documents
    ),
    lt AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_in,
             CAST(sum(n) AS BIGINT) AS n_tokens_in
      FROM split GROUP BY lang
    ),
    sw AS (
      SELECT lang, n_docs_in, n_tokens_in,
             CAST(FLOOR(sqrt(CAST(n_tokens_in AS DOUBLE)) * 1000) AS BIGINT)
               AS weight_milli
      FROM lt
    ),
    tot AS (SELECT CAST(sum(weight_milli) AS BIGINT) AS s FROM sw),
    q AS (
      SELECT lang, n_docs_in, n_tokens_in,
             CAST(FLOOR({RECIPE_BUDGET_TOKENS} * weight_milli * 1.0 / tot.s)
                  AS BIGINT) AS quota_tokens
      FROM sw CROSS JOIN tot
    ),
    rates AS (
      SELECT lang, n_docs_in, n_tokens_in, quota_tokens,
             CAST(FLOOR(quota_tokens * 1000000.0 / n_tokens_in) AS BIGINT)
               AS rep_micro
      FROM q
    ),
    gated AS (
      SELECT s.doc_id, s.lang, s.n,
             r.rep_micro // 1000000
             + CASE WHEN {h60_sql("CAST(s.doc_id AS VARCHAR)")} % 1000000
                         < r.rep_micro % 1000000 THEN 1 ELSE 0 END AS copies
      FROM split s JOIN rates r USING (lang)
    )
    SELECT r.lang, r.n_docs_in, r.n_tokens_in, r.quota_tokens, r.rep_micro,
           CAST(sum(g.copies) AS BIGINT) AS n_docs_out,
           CAST(sum(g.n * g.copies) AS BIGINT) AS n_tokens_out,
           CAST(sum(g.doc_id * g.copies) AS BIGINT) AS id_sum_out
    FROM gated g JOIN rates r USING (lang)
    GROUP BY 1, 2, 3, 4, 5 ORDER BY r.lang
    """,
    f"Recipe MATERIALIZATION (the execution half of data_recipe_epochs, "
    f"VERDICT r11 brief #6): per-source sqrt-weighted token quotas under "
    f"the {RECIPE_BUDGET_TOKENS}-token budget become per-doc COPY COUNTS "
    "via a content-stable hash gate — floor(rep) guaranteed copies plus "
    "one fractional-remainder gated copy, so the emitted multiset is "
    "deterministic across engines and runs (no RNG), exact for BOTH "
    "down-sampling (rep<1) and multi-epoch up-sampling (rep>1) — with "
    "per-source attrition accounting (docs/tokens in vs out, multiset "
    "id checksum) joined back to the recipe.",
)
def recipe_materialize_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materializes the training mix, not just the plan: ``copies`` is
    the number of times each doc enters the mixed corpus. Scale shape:
    two LINEAR scans of (lang, text) — one map-side-combined aggregate
    to |langs| recipe rows, one gate pass joined against the broadcast
    recipe — zero wide shuffles of document data; the heavy multiset
    itself is never collected (the query returns the per-source
    accounting; a pipeline would write ``gated`` straight to a sink).
    At 100 TB both passes stream; the only exchange is the |langs|-row
    aggregate."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT)
    per_doc = docs.select(
        "doc_id", "lang", F.size(words).cast("long").alias("n")
    )
    lt = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_in"),
        F.sum("n").cast("long").alias("n_tokens_in"),
    )
    sw = lt.withColumn(
        "weight_milli",
        F.floor(F.sqrt(F.col("n_tokens_in").cast("double")) * 1000).cast("long"),
    )
    # grand total via a single-partition window over the |langs|-row
    # aggregate (bounded — NOT document data), so Catalyst reuses ONE
    # token-count scan instead of re-deriving the total from a second
    rates = (
        sw.withColumn(
            "s", F.sum("weight_milli").over(W.partitionBy(F.lit(1)))
        )
        .withColumn(
            "quota_tokens",
            F.floor(
                F.lit(RECIPE_BUDGET_TOKENS).cast("long")
                * F.col("weight_milli")
                * F.lit(1.0)
                / F.col("s")
            ).cast("long"),
        )
        .withColumn(
            "rep_micro",
            F.floor(
                F.col("quota_tokens") * F.lit(1000000.0) / F.col("n_tokens_in")
            ).cast("long"),
        )
        .select(
            "lang", "n_docs_in", "n_tokens_in", "quota_tokens", "rep_micro"
        )
    )
    gate = h60_col(F.col("doc_id").cast("string")) % 1000000
    gated = per_doc.join(F.broadcast(rates), "lang").withColumn(
        "copies",
        F.expr("rep_micro div 1000000")  # integer DIV: dialect-exact
        + F.when(gate < F.col("rep_micro") % 1000000, 1).otherwise(0),
    )
    return (
        gated.groupBy(
            "lang", "n_docs_in", "n_tokens_in", "quota_tokens", "rep_micro"
        )
        .agg(
            F.sum("copies").cast("long").alias("n_docs_out"),
            F.sum(F.col("n") * F.col("copies")).cast("long").alias("n_tokens_out"),
            F.sum(F.col("doc_id") * F.col("copies")).cast("long").alias("id_sum_out"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# PSI feature drift (population stability index)
# ---------------------------------------------------------------------------

PSI_BINS = 10


@register(
    "psi_feature_drift",
    f"""
    WITH bounds AS (
      SELECT min(value) AS vmin, max(value) AS vmax,
             min(epoch_us(CAST(ts AS TIMESTAMP))) AS tmin,
             max(epoch_us(CAST(ts AS TIMESTAMP))) AS tmax
      FROM events
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) * 2
                       <= bounds.tmin + bounds.tmax
                  THEN 0 ELSE 1 END AS half,
             LEAST({PSI_BINS - 1}, CAST(FLOOR((value - bounds.vmin)
                   * {PSI_BINS} / (bounds.vmax - bounds.vmin + 1e-9))
                   AS BIGINT)) AS bin
      FROM events CROSS JOIN bounds
    ),
    cells AS (
      SELECT event_type, half, bin, count(*) AS c
      FROM binned GROUP BY event_type, half, bin
    ),
    halves AS (
      SELECT event_type, half, CAST(sum(c) AS BIGINT) AS n
      FROM cells GROUP BY event_type, half
    ),
    grid AS (
      SELECT h0.event_type, g.bin,
             COALESCE(c0.c, 0) AS c_p, h0.n AS n_p,
             COALESCE(c1.c, 0) AS c_q, h1.n AS n_q
      FROM (SELECT event_type, n FROM halves WHERE half = 0) h0
      JOIN (SELECT event_type, n FROM halves WHERE half = 1) h1
        ON h0.event_type = h1.event_type
      CROSS JOIN (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin) g
      LEFT JOIN cells c0 ON c0.event_type = h0.event_type
        AND c0.half = 0 AND c0.bin = g.bin
      LEFT JOIN cells c1 ON c1.event_type = h0.event_type
        AND c1.half = 1 AND c1.bin = g.bin
    ),
    terms AS (
      SELECT event_type,
             CAST(ROUND(((c_p + 1.0) / (n_p + {PSI_BINS})
                         - (c_q + 1.0) / (n_q + {PSI_BINS}))
                        * ln(((c_p + 1.0) * (n_q + {PSI_BINS}))
                             / ((c_q + 1.0) * (n_p + {PSI_BINS})))
                        * 1000000) AS BIGINT) AS t_micro
      FROM grid
    )
    SELECT event_type, CAST(sum(t_micro) AS BIGINT) AS psi_micro
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    f"Population stability index per event type: value distribution of "
    f"the first time-half vs the second over {PSI_BINS} equal-width "
    "bins (Laplace-smoothed, per-bin terms integerized to micro-nats) "
    "— the standard feature-drift monitor",
)
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan computes global bounds (1-row broadcast), a second
    bins every event — state from there is |types|×2×B cells. The PSI
    grid densifies with a generated bin spine so empty bins still
    contribute their smoothed mass, exactly as the textbook formula
    requires."""
    from .queries import epoch_us_col

    ev = _t(spark, sf_dir, "events")
    eus = epoch_us_col(ev, "ts")
    bounds = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min(eus).alias("tmin"),
        F.max(eus).alias("tmax"),
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            eus * 2 <= F.col("tmin") + F.col("tmax"), 0
        ).otherwise(1).alias("half"),
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                * PSI_BINS
                / (F.col("vmax") - F.col("vmin") + F.lit(1e-9))
            ),
        )
        .cast("long")
        .alias("bin"),
    )
    cells = binned.groupBy("event_type", "half", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    cells.persist()
    halves = cells.groupBy("event_type", "half").agg(
        F.sum("c").cast("long").alias("n")
    )
    h0 = halves.filter("half = 0").select("event_type", F.col("n").alias("n_p"))
    h1 = halves.filter("half = 1").select("event_type", F.col("n").alias("n_q"))
    spine = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    c0 = cells.filter("half = 0").select(
        "event_type", "bin", F.col("c").alias("c_p")
    )
    c1 = cells.filter("half = 1").select(
        "event_type", "bin", F.col("c").alias("c_q")
    )
    grid = (
        h0.join(h1, "event_type")
        .crossJoin(F.broadcast(spine))
        .join(c0, ["event_type", "bin"], "left")
        .join(c1, ["event_type", "bin"], "left")
        .select(
            "event_type",
            F.coalesce(F.col("c_p"), F.lit(0)).alias("c_p"),
            "n_p",
            F.coalesce(F.col("c_q"), F.lit(0)).alias("c_q"),
            "n_q",
        )
    )
    nb = F.lit(float(PSI_BINS))
    term = F.round(
        (
            (F.col("c_p") + F.lit(1.0)) / (F.col("n_p") + nb)
            - (F.col("c_q") + F.lit(1.0)) / (F.col("n_q") + nb)
        )
        * F.log(
            ((F.col("c_p") + F.lit(1.0)) * (F.col("n_q") + nb))
            / ((F.col("c_q") + F.lit(1.0)) * (F.col("n_p") + nb))
        )
        * 1000000.0,
        0,
    ).cast("long")
    return (
        grid.select("event_type", term.alias("t_micro"))
        .groupBy("event_type")
        .agg(F.sum("t_micro").cast("long").alias("psi_micro"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Embedding centroid drift
# ---------------------------------------------------------------------------

CENTROID_DIM = 64
CENTROID_MILLI = 1000  # per-element quantization: keeps the dot in BIGINT


@register(
    "embedding_centroid_drift",
    f"""
    WITH q AS (
      SELECT label, vec_id % 2 AS half,
             unnest(generate_series(1, {CENTROID_DIM})) AS j,
             unnest(list_transform(embedding,
               x -> CAST(ROUND(x * {CENTROID_MILLI}) AS BIGINT))) AS e
      FROM embeddings
    ),
    s AS (
      SELECT label, half, j, CAST(sum(e) AS BIGINT) AS sj, count(*) AS n
      FROM q GROUP BY label, half, j
    ),
    w AS (
      SELECT a.label, a.j, a.sj AS sa, b.sj AS sb
      FROM (SELECT * FROM s WHERE half = 0) a
      JOIN (SELECT * FROM s WHERE half = 1) b
        ON a.label = b.label AND a.j = b.j
    ),
    dots AS (
      SELECT label,
             CAST(sum(sa * sb) AS BIGINT) AS dab,
             CAST(sum(sa * sa) AS BIGINT) AS daa,
             CAST(sum(sb * sb) AS BIGINT) AS dbb
      FROM w GROUP BY label
    )
    SELECT CAST(label AS INT) AS label,
           ROUND(dab / (sqrt(CAST(daa AS DOUBLE)) * sqrt(CAST(dbb AS DOUBLE))),
                 6) AS centroid_cos
    FROM dots ORDER BY label
    """,
    "Per-label embedding centroid drift: cosine between the even-id "
    f"and odd-id halves' centroid sums, elements quantized to 1/"
    f"{CENTROID_MILLI} so every sum and dot stays in exact BIGINT "
    "(order-free) — the embedding-space counterpart of PSI",
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float centroid means would be summation-order-dependent; milli-
    quantizing per element first makes the per-(label, half, dim) sums
    exact integers (drift at 1e-3 resolution is far below any signal
    threshold), and the 64-term dot stays within BIGINT by
    construction. One explode pass; state is |labels|×2×64 integers."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x * CENTROID_MILLI, 0).cast("long"),
            )
        ).alias("j0", "e"),
    ).select("label", "half", (F.col("j0") + 1).alias("j"), "e")
    s = q.groupBy("label", "half", "j").agg(
        F.sum("e").cast("long").alias("sj")
    )
    a = s.filter("half = 0").select("label", "j", F.col("sj").alias("sa"))
    b = s.filter("half = 1").select("label", "j", F.col("sj").alias("sb"))
    dots = (
        a.join(b, ["label", "j"])
        .groupBy("label")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dab"),
            F.sum(F.col("sa") * F.col("sa")).cast("long").alias("daa"),
            F.sum(F.col("sb") * F.col("sb")).cast("long").alias("dbb"),
        )
    )
    return dots.select(
        F.col("label").cast("int").alias("label"),
        F.round(
            F.col("dab")
            / (
                F.sqrt(F.col("daa").cast("double"))
                * F.sqrt(F.col("dbb").cast("double"))
            ),
            6,
        ).alias("centroid_cos"),
    ).orderBy("label")
