"""Materialized views with incremental (CDF-driven) refresh.

A materialized view here IS a lake table — pk = the GROUP BY columns,
content = the aggregate, definition + last-refreshed base version in
TBLPROPERTIES — so every table capability (time travel, tags, SQL,
clone, the DataSource) applies to MVs for free. What this module adds
is *maintenance*:

  * ``CREATE MATERIALIZED VIEW mv AS SELECT g, sum(x) AS s,
    count(*) AS n FROM t [WHERE p] GROUP BY g`` materializes the
    aggregate against a PINNED base snapshot and records
    ``(base, base_version, query)``;
  * ``REFRESH MATERIALIZED VIEW mv`` reads the base's change feed
    between the recorded version and the tip (``LakeTable.changes``,
    preimages mode), folds each change row in with sign +1
    (insert / update_postimage) or −1 (delete / update_preimage),
    aggregates the signed deltas per group — a frame the size of the
    CHURN, not the base — and MERGEs it into the view (groups whose
    maintained ``count(*)`` reaches zero are deleted via the merge's
    tombstone channel). Refresh cost is O(changed rows), which is the
    whole point at 100 TB: a nightly 0.1 % upsert refreshes the view by
    touching 0.1 % of the data. ``REFRESH ... FULL`` recomputes from
    scratch (the escape hatch, and the upgrade path after schema
    changes).

Supported aggregate forms — the self-maintainable ring (the classic IVM
result): ``sum(<expr>)``, ``count(*)``, ``count(<expr>)``; a
``count(*)`` column is REQUIRED (group liveness is undecidable without
it — real IVM systems carry the same hidden count). MIN/MAX are
rejected: they are not incrementally maintainable under deletes without
re-scanning the group (Databricks' incremental MVs carry the same
restriction). ``sum`` is maintained 0-seeded: a live group whose every
value is NULL reports 0 where a from-scratch aggregate reports NULL —
documented divergence, avoided entirely by non-null measures.

Reference anchor: the reference exposes its tables to DuckDB for
exactly this kind of derived rollup (`DucklakeTableManager.java:161-164`
registers tables for SQL); the MV layer makes the rollup a maintained
artifact instead of a re-run query.

Consistency: the refresh MERGE commits the new ``mv.base_version`` in
the SAME manifest commit as the data (``LakeWriter.extra_commit_props``),
so a crash can never leave the version marker ahead of or behind the
applied deltas — replays re-derive from the recorded version
idempotently.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .table import _IDENT, quote_ident, split_top_level, unquote_ident
from .writer import LakeWriter

PROP_QUERY = "mv.query"
PROP_BASE = "mv.base"
PROP_BASE_VERSION = "mv.base_version"

_AGG_RE = re.compile(
    r"^(sum|count)\s*\((.+)\)\s+AS\s+(" + _IDENT + r")\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DEF_RE = re.compile(
    r"^SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<base>" + _IDENT + r")"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<groups>.+)$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass
class MvDef:
    base: str
    where: str | None
    groups: list[str]
    # (kind, expr, alias): kind in {"sum", "count_star", "count"}
    aggs: list[tuple[str, str, str]]
    count_alias: str
    query: str


def parse_mv_query(query: str) -> MvDef:
    q = query.strip().rstrip(";").strip()
    m = _DEF_RE.match(q)
    if not m:
        raise ValueError(
            "materialized view definition must be "
            "'SELECT <group cols + aggregates> FROM <table> [WHERE p] "
            f"GROUP BY <cols>', got: {q!r}"
        )
    groups = [unquote_ident(g.strip()) for g in split_top_level(m.group("groups"))]
    aggs: list[tuple[str, str, str]] = []
    seen_groups: list[str] = []
    count_alias = None
    for item in split_top_level(m.group("items")):
        item = item.strip()
        am = _AGG_RE.match(item)
        if am:
            fn = am.group(1).lower()
            inner = am.group(2).strip()
            alias = unquote_ident(am.group(3))
            if fn == "count" and inner == "*":
                aggs.append(("count_star", "*", alias))
                count_alias = count_alias or alias
            elif fn == "count":
                aggs.append(("count", inner, alias))
            else:
                aggs.append(("sum", inner, alias))
            continue
        name = unquote_ident(item)
        if name in groups:
            seen_groups.append(name)
            continue
        low = item.lower()
        if re.match(r"^(min|max|avg|stddev|var)\s*\(", low):
            raise ValueError(
                f"materialized views maintain only sum/count incrementally "
                f"(min/max/avg are not self-maintainable under deletes); "
                f"got {item!r} — express avg as sum/count, or use a plain "
                f"query for the rest"
            )
        raise ValueError(
            f"unsupported select item {item!r} in materialized view "
            f"(group column, sum(expr) AS a, count(*) AS a, or "
            f"count(expr) AS a)"
        )
    if sorted(seen_groups) != sorted(groups):
        raise ValueError(
            f"materialized view must select every GROUP BY column "
            f"(groups {groups}, selected {seen_groups})"
        )
    if count_alias is None:
        raise ValueError(
            "materialized view requires a count(*) AS <alias> column — "
            "group liveness under deletes is undecidable without it"
        )
    if not aggs:
        raise ValueError("materialized view needs at least one aggregate")
    return MvDef(
        base=unquote_ident(m.group("base")),
        where=(m.group("where") or "").strip() or None,
        groups=groups,
        aggs=aggs,
        count_alias=count_alias,
        query=q,
    )


def _agg_cols(d: MvDef) -> list:
    cols = []
    for kind, expr, alias in d.aggs:
        if kind == "count_star":
            cols.append(F.count(F.lit(1)).cast("long").alias(alias))
        elif kind == "count":
            cols.append(F.count(F.expr(expr)).cast("long").alias(alias))
        else:
            cols.append(F.sum(F.expr(expr)).alias(alias))
    return cols


def _guard_null_groups(df: DataFrame, groups: list[str], ctx: str) -> None:
    cond = None
    for g in groups:
        c = F.col(g).isNull()
        cond = c if cond is None else (cond | c)
    if df.filter(cond).limit(1).count() > 0:
        raise ValueError(
            f"{ctx}: NULL in GROUP BY column(s) {groups} — the view's "
            f"merge identity is its group key, which must be non-null "
            f"(filter or coalesce the key in the definition)"
        )


def _full_frame(cat, d: MvDef, version: int) -> DataFrame:
    base = cat.table(d.base)
    df = base.read(version=version)
    if d.where:
        df = df.filter(d.where)
    _guard_null_groups(df.select(*d.groups), d.groups, f"materialize {d.base}")
    return df.groupBy(*[F.col(g) for g in d.groups]).agg(*_agg_cols(d))


def _writer(cat, name: str, d: MvDef) -> LakeWriter:
    # deterministic pruning-path merges: MV deltas are tiny and the
    # tombstone channel must behave identically at every size
    return LakeWriter(
        cat.table(name), pk=list(d.groups), small_table_fast_path=False
    )


def create_materialized_view(
    cat, name: str, query: str, replace: bool = False
) -> int:
    """CREATE MATERIALIZED VIEW: materialize against the base's CURRENT
    version (pinned — a concurrent base write after the pin simply waits
    for the first refresh) and record the definition."""
    d = parse_mv_query(query)
    t = cat.table(name)
    if t.exists() and not replace:
        raise ValueError(f"table {name!r} already exists")
    base = cat.table(d.base)
    if not base.exists():
        raise ValueError(f"materialized view base {d.base!r} does not exist")
    v = base.current_version()
    frame = _full_frame(cat, d, v)
    if t.exists():
        t.replace(frame.schema, pk=list(d.groups))
    w = _writer(cat, name, d)
    w.extra_commit_props = {
        "tblproperties": {
            PROP_QUERY: d.query,
            PROP_BASE: d.base,
            PROP_BASE_VERSION: str(v),
        }
    }
    w.write(frame)
    return cat.table(name).current_version()


def refresh_materialized_view(cat, name: str, full: bool = False) -> dict:
    """REFRESH MATERIALIZED VIEW: fold the base's change feed since the
    recorded version into the view (one MERGE, churn-sized), or
    recompute from scratch with ``full=True``. Returns a status dict."""
    t = cat.table(name)
    props = t.properties()
    if PROP_QUERY not in props:
        raise ValueError(f"{name!r} is not a materialized view")
    d = parse_mv_query(props[PROP_QUERY])
    base = cat.table(d.base)
    from_v = int(props[PROP_BASE_VERSION])
    to_v = base.current_version()
    if to_v == from_v and not full:
        return {"view": name, "mode": "noop", "from": from_v, "to": to_v}
    marker = {
        "tblproperties": {**props, PROP_BASE_VERSION: str(to_v)}
    }
    if full:
        frame = _full_frame(cat, d, to_v)
        w = _writer(cat, name, d)
        w.extra_commit_props = marker
        w.overwrite(frame)
        return {"view": name, "mode": "full", "from": from_v, "to": to_v}
    ch = base.changes(from_v, to_v, preimages=True)
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
        .when(F.col("_change_type").isin("delete", "update_preimage"), -1)
        .otherwise(0)
    )
    ch = ch.withColumn("__sign", sign)
    if d.where:
        # row-level predicates commute with signed folding: a pre-image
        # that matched contributes -1, a post-image that matches +1
        ch = ch.filter(d.where)
    _guard_null_groups(
        ch.select(*d.groups), d.groups, f"refresh {name}"
    )
    delta_cols = []
    for kind, expr, alias in d.aggs:
        if kind == "count_star":
            delta_cols.append(F.sum(F.col("__sign")).cast("long").alias(alias))
        elif kind == "count":
            delta_cols.append(
                F.sum(
                    F.when(F.expr(expr).isNotNull(), F.col("__sign")).otherwise(0)
                ).cast("long").alias(alias)
            )
        else:
            delta_cols.append(
                F.sum(F.col("__sign") * F.coalesce(F.expr(expr), F.lit(0))).alias(alias)
            )
    delta = ch.groupBy(*[F.col(g) for g in d.groups]).agg(*delta_cols)
    cur = t.read().select(
        *d.groups, *[F.col(a).alias(f"__cur_{a}") for _, _, a in d.aggs]
    )
    aliases = [a for _, _, a in d.aggs]
    folded = delta.join(cur, on=list(d.groups), how="left").select(
        *d.groups,
        *[
            (
                F.coalesce(F.col(f"__cur_{a}"), F.lit(0)) + F.col(a)
            ).alias(a)
            for a in aliases
        ],
    )
    # sum columns keep the base's types (long + long, double + double);
    # the merge conform handles widening like any write
    dead = F.col(d.count_alias) == 0
    out = folded.withColumn("__dead", dead)
    w = _writer(cat, name, d)
    w.extra_commit_props = marker
    w.merge(out, tombstone_col="__dead")
    return {"view": name, "mode": "incremental", "from": from_v, "to": to_v}
