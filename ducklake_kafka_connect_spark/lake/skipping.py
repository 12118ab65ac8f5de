"""Predicate-based data skipping over manifest file statistics.

The manifest stores per-file ``{column: [min, max]}`` (plus a third
``null_count`` element when every row group reports one) harvested from
parquet row-group footers at write time (``table.write_data_files``).
Given a SQL predicate string, this module extracts the top-level AND
conjuncts it can prove things about — ``col <op> literal``,
``col BETWEEN a AND b``, ``col IN (...)``, ``col IS [NOT] NULL`` — and
drops files whose stats make a conjunct unsatisfiable.

Everything here is **conservative**: any construct the parser does not
understand (OR at the top level, function calls, column-to-column
comparisons), any missing statistic, and any type mismatch keeps the
file. Pruning only ever removes files that provably contain no
matching row, so ``read(where=p)`` ≡ ``read().filter(p)`` by
construction. The same model — scan the driver-side file index, then
hand Spark an explicit pruned file list — is how Delta/Iceberg data
skipping works; at 100 TB the manifest lookup is a metadata operation
that replaces listing and footer-reading thousands of files.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<cmp><=|>=|!=|<>|==|=|<|>)
      | (?P<punct>[(),])
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "between", "in", "is", "null", "true", "false",
             "timestamp", "date"}


def _tokenize(text: str) -> list[tuple[str, object]] | None:
    """→ [(kind, value)] with kind ∈ {str,num,cmp,punct,kw,ident}; None if
    any character fails to lex (→ no pruning)."""
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            return None if text[pos:].strip() else out
        pos = m.end()
        if m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            raw = m.group("num")
            out.append(("num", float(raw) if any(c in raw for c in ".eE") else int(raw)))
        elif m.lastgroup == "cmp":
            out.append(("cmp", m.group("cmp")))
        elif m.lastgroup == "punct":
            out.append(("punct", m.group("punct")))
        else:
            w = m.group("word")
            out.append(("kw", w.lower()) if w.lower() in _KEYWORDS else ("ident", w))
    return out


@dataclass
class Conjunct:
    column: str
    op: str          # '=', '!=', '<', '<=', '>', '>=', 'between', 'in',
                     # 'is_null', 'is_not_null'
    value: object    # scalar, (lo, hi) for between, list for in


_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!="}


def _literal(toks: list, i: int):
    """Parse one literal at position i → (value, next_i) or (None, -1)."""
    if i >= len(toks):
        return None, -1
    kind, val = toks[i]
    if kind in ("str", "num"):
        return val, i + 1
    if kind == "kw" and val in ("timestamp", "date") and i + 1 < len(toks) and toks[i + 1][0] == "str":
        return toks[i + 1][1], i + 2
    if kind == "kw" and val in ("true", "false"):
        return val == "true", i + 1
    return None, -1


def parse_conjuncts(predicate: str) -> list[Conjunct]:
    """Extract provable top-level AND conjuncts; unknown shapes are
    silently dropped (less pruning, never wrong)."""
    toks = _tokenize(predicate)
    if toks is None:
        return []
    # OR anywhere at paren depth 0 defeats conjunct splitting; inside
    # parens we simply fail to match that group (conservative).
    depth = 0
    for kind, val in toks:
        if kind == "punct" and val == "(":
            depth += 1
        elif kind == "punct" and val == ")":
            depth -= 1
        elif kind == "kw" and val == "or" and depth == 0:
            return []
    # split on AND at depth 0, honoring BETWEEN's embedded AND
    groups: list[list] = [[]]
    depth = 0
    between_pending = False
    for kind, val in toks:
        if kind == "punct" and val == "(":
            depth += 1
        elif kind == "punct" and val == ")":
            depth -= 1
        if kind == "kw" and val == "between":
            between_pending = True
        if kind == "kw" and val == "and" and depth == 0:
            if between_pending:
                between_pending = False
                groups[-1].append((kind, val))
            else:
                groups.append([])
            continue
        groups[-1].append((kind, val))
    out: list[Conjunct] = []
    for g in groups:
        # strip one layer of wrapping parens
        while (
            len(g) >= 2
            and g[0] == ("punct", "(")
            and g[-1] == ("punct", ")")
            and _balanced(g[1:-1])
        ):
            g = g[1:-1]
        c = _match_conjunct(g)
        if c is not None:
            out.append(c)
    return out


def _balanced(toks: list) -> bool:
    depth = 0
    for kind, val in toks:
        if kind == "punct" and val == "(":
            depth += 1
        elif kind == "punct" and val == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _match_conjunct(g: list) -> Conjunct | None:
    if not g:
        return None
    # col IS NULL | col IS NOT NULL
    if len(g) == 3 and g[0][0] == "ident" and g[1] == ("kw", "is") and g[2] == ("kw", "null"):
        return Conjunct(g[0][1], "is_null", None)
    if (
        len(g) == 4
        and g[0][0] == "ident"
        and g[1] == ("kw", "is")
        and g[2] == ("kw", "not")
        and g[3] == ("kw", "null")
    ):
        return Conjunct(g[0][1], "is_not_null", None)
    # col <op> lit   |   lit <op> col
    if len(g) >= 3 and g[0][0] == "ident" and g[1][0] == "cmp":
        lit, nxt = _literal(g, 2)
        if nxt == len(g) and lit is not None:
            op = {"==": "=", "<>": "!="}.get(g[1][1], g[1][1])
            return Conjunct(g[0][1], op, lit)
    if len(g) >= 3 and g[-1][0] == "ident" and g[-2][0] == "cmp":
        lit, nxt = _literal(g, 0)
        if nxt == len(g) - 2 and lit is not None:
            op = {"==": "=", "<>": "!="}.get(g[-2][1], g[-2][1])
            return Conjunct(g[-1][1], _FLIP.get(op, op), lit)
    # col BETWEEN lit AND lit
    if len(g) >= 5 and g[0][0] == "ident" and g[1] == ("kw", "between"):
        lo, i = _literal(g, 2)
        if i > 0 and i < len(g) and g[i] == ("kw", "and"):
            hi, j = _literal(g, i + 1)
            if j == len(g) and lo is not None and hi is not None:
                return Conjunct(g[0][1], "between", (lo, hi))
    # col IN (lit, lit, ...)
    if (
        len(g) >= 4
        and g[0][0] == "ident"
        and g[1] == ("kw", "in")
        and g[2] == ("punct", "(")
        and g[-1] == ("punct", ")")
    ):
        vals = []
        i = 3
        while i < len(g) - 1:
            lit, nxt = _literal(g, i)
            if lit is None:
                return None
            vals.append(lit)
            i = nxt
            if i < len(g) - 1:
                if g[i] != ("punct", ","):
                    return None
                i += 1
        if vals:
            return Conjunct(g[0][1], "in", vals)
    return None


def _cmp_ok(a, b) -> bool:
    """Values comparable without implicit coercion surprises?"""
    num = (int, float)
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return isinstance(a, str) and isinstance(b, str)


def _impossible(c: Conjunct, lo, hi) -> bool:
    """Can [lo, hi] (either bound possibly None = unknown/unbounded)
    contain a row satisfying the conjunct? True → provably not."""
    try:
        if c.op == "=":
            v = c.value
            if not _cmp_ok(v, lo if lo is not None else hi):
                return False
            return (lo is not None and v < lo) or (hi is not None and v > hi)
        if c.op == "in":
            vals = [v for v in c.value if _cmp_ok(v, lo if lo is not None else hi)]
            if len(vals) != len(c.value):
                return False
            return all(
                (lo is not None and v < lo) or (hi is not None and v > hi) for v in vals
            )
        if c.op == "between":
            a, b = c.value
            if not (_cmp_ok(a, lo if lo is not None else hi) and _cmp_ok(b, lo if lo is not None else hi)):
                return False
            return (hi is not None and hi < a) or (lo is not None and lo > b)
        if c.op == "<":
            return lo is not None and _cmp_ok(c.value, lo) and lo >= c.value
        if c.op == "<=":
            return lo is not None and _cmp_ok(c.value, lo) and lo > c.value
        if c.op == ">":
            return hi is not None and _cmp_ok(c.value, hi) and hi <= c.value
        if c.op == ">=":
            return hi is not None and _cmp_ok(c.value, hi) and hi < c.value
        if c.op == "!=":
            return (
                lo is not None
                and hi is not None
                and lo == hi
                and _cmp_ok(c.value, lo)
                and lo == c.value
            )
    except TypeError:
        return False
    return False


def file_matches(conjuncts: list[Conjunct], stats: dict | None) -> bool:
    """True ⇔ the file might contain matching rows. ``stats`` maps
    column → [min, max] or [min, max, null_count]; absent columns /
    absent stats → keep (older manifests carry no null counts and stay
    valid — every new check degrades to 'keep' without one)."""
    if not conjuncts or not stats:
        return True
    nrows = stats.get("__rows")
    for c in conjuncts:
        rng = stats.get(c.column)
        if not rng:
            continue
        lo, hi = rng[0], rng[1]
        nulls = rng[2] if len(rng) > 2 else None
        if c.op == "is_null":
            if nulls == 0:
                return False
            continue
        if c.op == "is_not_null":
            if nulls is not None and nrows is not None and nulls == nrows:
                return False
            continue
        # comparisons never match NULL: an all-NULL column fails every
        # remaining conjunct shape regardless of bounds
        if nulls is not None and nrows is not None and nulls == nrows:
            return False
        if lo is None and hi is None:
            continue  # null-count-only entry: no bounds to test
        if _impossible(c, lo, hi):
            return False
    return True


def prune_files(files: list[str], file_stats: dict, predicate: str) -> tuple[list[str], int]:
    """→ (kept_files, pruned_count)."""
    conjuncts = parse_conjuncts(predicate)
    if not conjuncts:
        return files, 0
    kept = [f for f in files if file_matches(conjuncts, file_stats.get(f))]
    return kept, len(files) - len(kept)
