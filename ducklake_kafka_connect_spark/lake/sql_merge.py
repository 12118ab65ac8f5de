"""SQL ``MERGE INTO`` over the lake writer — the reference's flagship
statement as a statement.

The reference's entire ingest path ultimately executes one SQL string:
``MERGE INTO <table> USING batch ON <pk conds> WHEN MATCHED THEN UPDATE
SET … WHEN NOT MATCHED THEN INSERT …`` (``ingestor/DucklakeWriter.java:
151-168`` — name-mapped columns, ``_inserted_at`` stamped only on
insert). The engine has had the SEMANTICS since round 3 (``LakeWriter.
merge`` and PK-routed INSERT); this module closes the SYNTAX gap so a
user porting reference-era SQL scripts runs them unchanged through
``LakeCatalog.sql``/``dml``.

Grammar (DuckDB/Delta-compatible subset, identifiers bare,
"double-quoted" with ``""`` escape — the reference's
``SqlIdentifierUtil.java:32-39`` discipline — or `backtick-quoted`)::

    MERGE INTO t [AS a]
    USING (<select>) [AS b] | USING src_table [AS b]
    ON <conjunction of pk equalities>        -- must cover t's full PK
    WHEN MATCHED [AND <cond>] THEN UPDATE SET * | col = expr [, ...]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED [AND <cond>] THEN INSERT * |
                                        (cols) VALUES (exprs)]

Execution is Spark-first, not row-at-a-time: the clauses compile to ONE
projection over ``source LEFT JOIN target`` (matched-ness from a
sentinel), and the resulting frame goes through the existing
``LakeWriter.merge`` — so the adaptive merge planning (small-table /
window / broadcast+Bloom file pruning, the Arrow fast path, group
commit) is reused verbatim, ``WHEN MATCHED … DELETE`` rides the
tombstone channel, and ``_inserted_at`` keeps the stamp-only-on-insert
invariant. When the statement is the reference's exact shape —
``UPDATE SET *`` + ``INSERT *``, no extra conditions — the join is
skipped entirely and the mapped source feeds ``merge`` directly (zero
overhead vs the API path).

Scale: the general path reads the target once for the pre-join; with a
single-column PK that read is bounded by the source's [min, max] key
range through the manifest stat prune (``read(where=…)``), the same
bound the writer's own rewrite planning uses. Clause conditions and
expressions may reference BOTH aliases (``t.cnt + s.cnt``) — they run
inside the joined projection, JVM-side.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, functions as F

from .table import _IDENT, quote_ident, unquote_ident, split_top_level, _dq_idents_to_backticks

#: sentinel marking target-row presence after the left join; stripped
#: before the write. Doubles as the tombstone carrier for DELETE.
_PRESENT = "__merge_target_present"
_TOMB = "__merge_tombstone"

_WHEN_RE = re.compile(r"\bWHEN\s+(NOT\s+)?MATCHED\b", re.IGNORECASE)
_THEN_RE = re.compile(r"\bTHEN\b", re.IGNORECASE)
_AND_RE = re.compile(r"\bAND\b", re.IGNORECASE)


def _scan_top_level(text: str, pattern: "re.Pattern[str]") -> list[int]:
    """Offsets where ``pattern`` matches at paren depth 0 and outside
    string/identifier quotes — the same scanner discipline as
    ``split_top_level`` (table.py), generalized to a regex."""
    out: list[int] = []
    depth = 0
    quote: str | None = None
    i = 0
    while i < len(text):
        ch = text[i]
        if quote is not None:
            if ch == quote:
                if i + 1 < len(text) and text[i + 1] == quote:
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = pattern.match(text, i)
            if m:
                out.append(i)
                i = m.end() - 1
        i += 1
    return out


def _split_on(text: str, pattern: "re.Pattern[str]") -> list[str]:
    """Split ``text`` at every top-level match of ``pattern``; the
    matched token starts each segment after the first."""
    offs = _scan_top_level(text, pattern)
    if not offs:
        return [text]
    parts = [text[: offs[0]]]
    for a, b in zip(offs, offs[1:] + [len(text)]):
        parts.append(text[a:b])
    return parts


def _qb(name: str) -> str:
    """Backtick-quote a raw identifier for Spark SQL."""
    return "`" + name.replace("`", "``") + "`"


def _ident_ref(text: str) -> "tuple[str | None, str] | None":
    """Parse ``[qualifier.]column`` (both possibly quoted); None if the
    text is not a plain column reference."""
    m = re.fullmatch(
        rf"\s*(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*", text, re.DOTALL
    )
    if not m:
        return None
    return (
        unquote_ident(m.group(1)) if m.group(1) else None,
        unquote_ident(m.group(2)),
    )


class MergeStatement:
    """Parsed form of one MERGE INTO statement."""

    def __init__(self, stmt: str):
        self.raw = stmt
        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})"
            rf"(?:\s+(?:AS\s+)?(?!USING\b)({_IDENT}))?"
            rf"\s+USING\s+",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"unsupported MERGE statement: {stmt!r}")
        self.target = unquote_ident(m.group(1))
        self.target_alias = unquote_ident(m.group(2)) if m.group(2) else self.target
        rest = stmt[m.end():].lstrip()
        # USING (<subquery>) | USING name
        if rest.startswith("("):
            depth, i = 0, 0
            quote = None
            for i, ch in enumerate(rest):
                if quote is not None:
                    if ch == quote:
                        quote = None
                elif ch in ("'", '"', "`"):
                    quote = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
            if depth != 0:
                raise ValueError("unbalanced parens in MERGE USING subquery")
            self.source_sql: str | None = rest[1:i].strip()
            self.source_name: str | None = None
            rest = rest[i + 1:]
        else:
            nm = re.match(rf"({_IDENT})", rest)
            if not nm:
                raise ValueError("MERGE USING expects a subquery or table name")
            self.source_name = unquote_ident(nm.group(1))
            self.source_sql = None
            rest = rest[nm.end():]
        am = re.match(
            rf"\s*(?:AS\s+)?(?!ON\b)({_IDENT})", rest, re.IGNORECASE
        )
        if am:
            self.source_alias = unquote_ident(am.group(1))
            rest = rest[am.end():]
        else:
            self.source_alias = self.source_name or "src"
        om = re.match(r"\s*ON\b", rest, re.IGNORECASE)
        if not om:
            raise ValueError("MERGE requires an ON clause")
        rest = rest[om.end():]
        when_offs = _scan_top_level(rest, _WHEN_RE)
        if not when_offs:
            raise ValueError("MERGE requires at least one WHEN clause")
        self.on_sql = rest[: when_offs[0]].strip()
        clauses = _split_on(rest, _WHEN_RE)[1:]
        # clause order matters (first-match-wins between UPDATE/DELETE)
        self.update: "dict | None" = None      # {cond, sets | '*'}
        self.delete: "dict | None" = None      # {cond}
        self.insert: "dict | None" = None      # {cond, cols, exprs | '*'}
        self.matched_order: list[str] = []
        for cl in clauses:
            self._parse_when(cl.strip())

    def _parse_when(self, cl: str) -> None:
        hm = re.match(r"WHEN\s+(NOT\s+)?MATCHED\b", cl, re.IGNORECASE)
        negated = bool(hm.group(1))
        body = cl[hm.end():].strip()
        cond = None
        then_offs = _scan_top_level(body, _THEN_RE)
        if not then_offs:
            raise ValueError(f"WHEN clause missing THEN: {cl!r}")
        head = body[: then_offs[0]].strip()
        action = body[then_offs[0]:].strip()[4:].strip()  # past 'THEN'
        if head:
            am = re.match(r"AND\b(.*)$", head, re.IGNORECASE | re.DOTALL)
            if not am:
                raise ValueError(f"bad WHEN clause condition: {head!r}")
            cond = am.group(1).strip()
        if negated:
            if self.insert is not None:
                raise ValueError("duplicate WHEN NOT MATCHED clause")
            im = re.match(
                r"INSERT\s*(\*|\((.*?)\)\s*VALUES\s*\((.*)\))\s*$",
                action,
                re.IGNORECASE | re.DOTALL,
            )
            if not im:
                raise ValueError(f"unsupported MERGE insert action: {action!r}")
            if im.group(1) == "*":
                self.insert = {"cond": cond, "cols": "*", "exprs": "*"}
            else:
                cols = [
                    unquote_ident(c) for c in split_top_level(im.group(2))
                ]
                exprs = [e.strip() for e in split_top_level(im.group(3))]
                if len(cols) != len(exprs):
                    raise ValueError(
                        f"INSERT column/value arity mismatch: {len(cols)} vs {len(exprs)}"
                    )
                self.insert = {"cond": cond, "cols": cols, "exprs": exprs}
            return
        um = re.match(r"UPDATE\s+SET\s+(.*)$", action, re.IGNORECASE | re.DOTALL)
        if um:
            if self.update is not None:
                raise ValueError("duplicate WHEN MATCHED ... UPDATE clause")
            body = um.group(1).strip()
            if body == "*":
                self.update = {"cond": cond, "sets": "*"}
            else:
                sets: dict[str, str] = {}
                for part in split_top_level(body):
                    sm = re.match(
                        rf"\s*(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*=\s*(.+)$",
                        part,
                        re.DOTALL,
                    )
                    if not sm:
                        raise ValueError(f"bad SET assignment: {part.strip()!r}")
                    if sm.group(1) and unquote_ident(sm.group(1)) != self.target_alias:
                        raise ValueError(
                            f"SET qualifier {sm.group(1)!r} is not the target alias"
                        )
                    sets[unquote_ident(sm.group(2))] = sm.group(3).strip()
                self.update = {"cond": cond, "sets": sets}
            self.matched_order.append("update")
            return
        if re.fullmatch(r"DELETE", action, re.IGNORECASE):
            if self.delete is not None:
                raise ValueError("duplicate WHEN MATCHED ... DELETE clause")
            self.delete = {"cond": cond}
            self.matched_order.append("delete")
            return
        raise ValueError(f"unsupported MERGE action: {action!r}")


def _pk_equalities(st: MergeStatement, pk: list[str]) -> dict[str, str]:
    """Validate the ON clause as a conjunction of equality conditions
    covering the target's FULL pk; returns {pk_col: source-side expr}."""
    key_exprs: dict[str, str] = {}
    for conj in _split_on(st.on_sql, _AND_RE):
        conj = re.sub(r"^\s*AND\b", "", conj, flags=re.IGNORECASE).strip()
        if not conj:
            continue
        sides = split_top_level(conj, "=")
        if len(sides) != 2:
            raise ValueError(
                f"MERGE ON must be a conjunction of equalities, got: {conj!r}"
            )
        refs = [_ident_ref(s) for s in sides]
        t_side = None
        for i, r in enumerate(refs):
            if r is not None and (
                r[0] == st.target_alias or (r[0] is None and r[1] in pk)
            ):
                t_side = i
                break
        if t_side is None:
            raise ValueError(
                f"MERGE ON condition must compare a target pk column: {conj!r}"
            )
        tcol = refs[t_side][1]
        if tcol not in pk:
            raise ValueError(
                f"MERGE ON references non-pk target column {tcol!r} "
                f"(the lake merge is pk-keyed, pk={pk})"
            )
        if tcol in key_exprs:
            raise ValueError(f"pk column {tcol!r} constrained twice in ON")
        key_exprs[tcol] = sides[1 - t_side].strip()
    missing = [p for p in pk if p not in key_exprs]
    if missing:
        raise ValueError(
            f"MERGE ON must cover the full pk {pk}; missing {missing}"
        )
    return key_exprs


def _literal(v) -> str | None:
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return None


def merge_into(catalog, stmt: str) -> str:
    """Execute one MERGE INTO statement against ``catalog``; returns the
    target table name. See the module docstring for the compile shape."""
    from .writer import LakeWriter
    from ..schema.reconcile import INSERTED_AT

    st = MergeStatement(stmt)
    t = catalog.table(st.target)
    if not t.exists():
        raise ValueError(f"MERGE INTO unknown table {st.target!r}")
    manifest = t.manifest()
    pk = list(manifest.pk or [])
    if not pk:
        raise ValueError(
            f"MERGE INTO {st.target}: table has no PRIMARY KEY — the lake "
            f"merge is pk-keyed (create the table with a PRIMARY KEY clause)"
        )
    key_exprs = {
        k: _dq_idents_to_backticks(v) for k, v in _pk_equalities(st, pk).items()
    }
    if st.update is None and st.insert is None and st.delete is None:
        raise ValueError("MERGE needs at least one action clause")

    # ---- source frame ----
    if st.source_sql is not None:
        src = catalog.sql(st.source_sql)
    elif catalog.table_exists(st.source_name):
        src = catalog.table(st.source_name).read()
    else:
        src = catalog.spark.table(st.source_name)

    data_cols = [
        f.name for f in manifest.schema.fields if f.name != INSERTED_AT
    ]
    non_pk = [c for c in data_cols if c not in pk]
    s_al, t_al = st.source_alias, st.target_alias
    if s_al == t_al:
        raise ValueError("MERGE source and target aliases must differ")

    def src_star(which: str) -> dict[str, str]:
        cols = {}
        for c in non_pk:
            if c not in src.columns:
                raise ValueError(
                    f"MERGE {which} *: source lacks column {c!r} "
                    f"(name-map it with an explicit column list)"
                )
            cols[c] = f"{_qb(s_al)}.{_qb(c)}"
        return cols

    upd_sets = None
    if st.update is not None:
        upd_sets = (
            src_star("UPDATE SET")
            if st.update["sets"] == "*"
            else {
                k: _dq_idents_to_backticks(v)
                for k, v in st.update["sets"].items()
            }
        )
        bad = [c for c in upd_sets if c in pk]
        if bad:
            raise ValueError(f"MERGE UPDATE SET may not assign pk column(s) {bad}")
        unknown = [c for c in upd_sets if c not in data_cols]
        if unknown:
            raise ValueError(f"MERGE UPDATE SET references unknown column(s) {unknown}")
    ins_exprs = None
    if st.insert is not None:
        if st.insert["cols"] == "*":
            ins_exprs = src_star("INSERT")
        else:
            ins_exprs = {}
            for c, e in zip(st.insert["cols"], st.insert["exprs"]):
                if c in pk:
                    continue  # pk always comes from the ON key exprs
                if c not in data_cols:
                    raise ValueError(f"MERGE INSERT references unknown column {c!r}")
                ins_exprs[c] = _dq_idents_to_backticks(e)

    # ---- fast path: the reference's exact shape (name-mapped full-row
    # upsert, no conditions, no delete) → mapped source straight into
    # the writer merge; no pre-join, no target read beyond the writer's
    # own pruning ----
    simple = (
        st.delete is None
        and st.update is not None
        and st.insert is not None
        and st.update["cond"] is None
        and st.insert["cond"] is None
        and upd_sets == ins_exprs
        and set(upd_sets) == set(non_pk)
    )
    writer = LakeWriter(t, pk=pk, auto_create=False)
    if simple:
        mapped = src.alias(s_al).select(
            *[F.expr(key_exprs[p]).alias(p) for p in pk],
            *[F.expr(upd_sets[c]).alias(c) for c in non_pk],
        )
        writer.merge(mapped)
        return st.target

    # ---- general path: compile the clauses into one projection over
    # source LEFT JOIN target ----
    tgt_where = _source_key_range_where(src, s_al, key_exprs, pk, manifest)
    tgt = t.read(where=tgt_where) if tgt_where else t.read()
    tgt = tgt.withColumn(_PRESENT, F.lit(True))
    sv = f"__merge_src_{uuid.uuid4().hex[:8]}"
    tv = f"__merge_tgt_{uuid.uuid4().hex[:8]}"
    src.createOrReplaceTempView(sv)
    tgt.createOrReplaceTempView(tv)
    try:
        matched = f"{_qb(t_al)}.{_qb(_PRESENT)} IS NOT NULL"
        upd_cond = (
            _dq_idents_to_backticks(st.update["cond"])
            if st.update is not None and st.update["cond"]
            else None
        )
        del_cond = (
            _dq_idents_to_backticks(st.delete["cond"])
            if st.delete is not None and st.delete["cond"]
            else None
        )
        ins_cond = (
            _dq_idents_to_backticks(st.insert["cond"])
            if st.insert is not None and st.insert["cond"]
            else None
        )
        projections = [f"({key_exprs[p]}) AS {_qb(p)}" for p in pk]
        for c in non_pk:
            branches = []
            if upd_sets is not None and c in upd_sets:
                guard = matched
                if upd_cond:
                    guard += f" AND coalesce(({upd_cond}), false)"
                branches.append(f"WHEN {guard} THEN ({upd_sets[c]})")
            # matched rows not taken by UPDATE keep their target value
            branches.append(f"WHEN {matched} THEN {_qb(t_al)}.{_qb(c)}")
            if ins_exprs is not None and c in ins_exprs:
                branches.append(f"ELSE ({ins_exprs[c]})")
            typ = manifest.schema[c].dataType.simpleString()
            projections.append(
                f"CAST((CASE {' '.join(branches)} END) AS {typ}) AS {_qb(c)}"
            )
        tomb = None
        if st.delete is not None:
            guard = matched
            if del_cond:
                guard += f" AND coalesce(({del_cond}), false)"
            if (
                st.update is not None
                and st.matched_order
                and st.matched_order[0] == "update"
                and upd_cond
            ):
                # first-match-wins: an earlier satisfied UPDATE shields
                # the row from DELETE
                guard += f" AND NOT coalesce(({upd_cond}), false)"
            elif st.update is not None and st.matched_order[0] == "update" and not upd_cond:
                # unconditional UPDATE listed first swallows every match
                guard = "false"
            tomb = f"(CASE WHEN {guard} THEN true ELSE false END) AS {_qb(_TOMB)}"
        # rows neither matched nor admitted by the INSERT clause drop out
        where = None
        if st.insert is None:
            where = f"({matched})"
        elif ins_cond:
            where = f"({matched}) OR coalesce(({ins_cond}), false)"
        sql = (
            f"SELECT {', '.join(projections + ([tomb] if tomb else []))} "
            f"FROM {sv} AS {_qb(s_al)} LEFT JOIN {tv} AS {_qb(t_al)} "
            f"ON {_dq_idents_to_backticks(st.on_sql)}"
        )
        if where:
            sql += f" WHERE {where}"
        frame = catalog.spark.sql(sql)
        writer.merge(frame, tombstone_col=_TOMB if tomb else None)
    finally:
        catalog.spark.catalog.dropTempView(sv)
        catalog.spark.catalog.dropTempView(tv)
    return st.target


def _source_key_range_where(
    src: DataFrame, s_al: str, key_exprs: dict[str, str], pk: list[str], manifest
) -> str | None:
    """Single-column-pk manifest prune for the pre-join target read: the
    join only needs target rows inside the source's [min, max] key range
    (rows outside cannot match), so one tiny source aggregate buys
    file-level skipping on the target — the same bound the writer's own
    rewrite planner uses. Multi-pk or exotic types: no prune (correct,
    just unbounded)."""
    if len(pk) != 1:
        return None
    p = pk[0]
    try:
        row = (
            src.alias(s_al)
            .agg(
                F.min(F.expr(key_exprs[p])).alias("lo"),
                F.max(F.expr(key_exprs[p])).alias("hi"),
            )
            .collect()[0]
        )
    except Exception:
        return None
    lo, hi = _literal(row["lo"]), _literal(row["hi"])
    if lo is None or hi is None:
        return None
    q = quote_ident(p)
    return f"{q} >= {lo} AND {q} <= {hi}"
