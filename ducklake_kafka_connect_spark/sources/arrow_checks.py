"""Executor-side CHECK-constraint evaluation for the Arrow sink.

The ``ducklake`` Python DataSource writes staged parquet from raw Arrow
batches in tasks — no SQL engine in sight — so it used to REFUSE any
table carrying stored CHECK constraints (honest, but it forced every
constrained CDC stream back onto the driver-side writer). The
reference's users run constraints as plain comparison predicates
(``v >= 0``, ``name IS NOT NULL``, AND/OR combos); that whole subset
maps 1:1 onto ``pyarrow.compute`` kernels, so the sink now compiles it
and enforces per Arrow batch, refusing only genuinely non-compilable
predicates (subqueries, functions, arithmetic…).

Design rules:

- **Compile-or-refuse, never drop.** Unlike the manifest skipper's
  conjunct parser (which may soundly ignore clauses it cannot prove,
  because pruning is an optimization), ENFORCEMENT must evaluate the
  whole predicate or none of it. Any token/shape outside the grammar
  raises :class:`CheckCompileError` at PLAN time, where the sink falls
  back to its existing refusal with the LakeWriter remedy.
- **SQL CHECK null semantics.** A row violates only when the predicate
  evaluates FALSE; NULL/UNKNOWN passes (``lake/writer.py``
  ``_enforce_constraints`` twin). AND/OR therefore use the Kleene
  kernels, and the final mask fills null with True.
- **Dry-run validation.** ``compile_check`` is exercised against an
  empty table of the staged schema on the driver, so type mismatches
  (``'x' > ts_col``) refuse at plan time instead of dying in a task.

Grammar (case-insensitive keywords)::

    expr   := term (OR term)*
    term   := unary (AND unary)*
    unary  := NOT unary | '(' expr ')' | pred
    pred   := col op literal | literal op col
            | col IS [NOT] NULL
            | col [NOT] IN '(' literal (',' literal)* ')'
            | col [NOT] BETWEEN literal AND literal
    op     := = | == | != | <> | < | <= | > | >=
"""

from __future__ import annotations

import re

__all__ = ["CheckCompileError", "compile_check", "violations"]


class CheckCompileError(ValueError):
    """Predicate outside the pyarrow-compilable subset."""


_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<cmp><=|>=|==|!=|<>|=|<|>)"
    r"|(?P<punct>[(),])"
    r"|(?P<qident>\"(?:[^\"]|\"\")*\"|`(?:[^`]|``)*`)"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_.]*)"
    r")"
)
_KEYWORDS = {
    "and", "or", "not", "is", "null", "in", "between", "true", "false",
    "date", "timestamp",
}


def _tokenize(text: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    raws: list[tuple[int, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip():
                raise CheckCompileError(f"cannot lex {text[pos:pos + 20]!r}")
            break
        pos = m.end()
        if m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            raw = m.group("num")
            out.append(
                ("num", float(raw) if any(c in raw for c in ".eE") else int(raw))
            )
        elif m.lastgroup == "cmp":
            op = m.group("cmp")
            out.append(("cmp", {"==": "=", "<>": "!="}.get(op, op)))
        elif m.lastgroup == "punct":
            out.append(("punct", m.group("punct")))
        elif m.lastgroup == "qident":
            q = m.group("qident")
            out.append(("ident", q[1:-1].replace(q[0] * 2, q[0])))
        else:
            w = m.group("word")
            out.append(
                ("kw", w.lower()) if w.lower() in _KEYWORDS else ("ident", w)
            )
            raws.append((len(out) - 1, w))
    # DATE/TIMESTAMP are typed-literal keywords ONLY directly before a
    # string ('DATE ''2024-01-01'''); elsewhere they are ordinary column
    # names (common ones, too) — restored with their original case
    for idx, raw in raws:
        k, v = out[idx]
        if k == "kw" and v in ("date", "timestamp"):
            nxt = out[idx + 1][0] if idx + 1 < len(out) else None
            if nxt != "str":
                out[idx] = ("ident", raw)
    return out


# ---- AST: tuples, picklable, evaluated with pyarrow.compute ----
# ("cmp", op, col, literal) / ("is_null", col, negate)
# / ("in", col, values, negate) / ("between", col, lo, hi, negate)
# / ("and"|"or", left, right) / ("not", node) / ("lit", bool)


class _Parser:
    def __init__(self, toks: list, columns: set[str]):
        self.toks = toks
        self.i = 0
        self.columns = columns

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str, val=None):
        k, v = self.take()
        if k != kind or (val is not None and v != val):
            raise CheckCompileError(f"expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        node = self.expr()
        if self.i != len(self.toks):
            raise CheckCompileError(
                f"trailing tokens at {self.toks[self.i:][:3]!r}"
            )
        return node

    def expr(self):
        node = self.term()
        while self.peek() == ("kw", "or"):
            self.take()
            node = ("or", node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self.peek() == ("kw", "and"):
            self.take()
            node = ("and", node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("kw", "not"):
            self.take()
            return ("not", self.unary())
        if self.peek() == ("punct", "("):
            self.take()
            node = self.expr()
            self.expect("punct", ")")
            return node
        return self.pred()

    def _literal(self):
        k, v = self.take()
        if k in ("str", "num"):
            return v
        if k == "kw" and v in ("true", "false"):
            return v == "true"
        if k == "kw" and v in ("date", "timestamp") and self.peek()[0] == "str":
            import datetime as _dt

            raw = self.take()[1]
            try:
                return (
                    _dt.date.fromisoformat(raw)
                    if v == "date"
                    else _dt.datetime.fromisoformat(raw)
                )
            except ValueError as e:
                raise CheckCompileError(f"bad {v.upper()} literal {raw!r}: {e}")
        raise CheckCompileError(f"expected literal, got {v!r}")

    def _column(self, name) -> str:
        if name not in self.columns:
            raise CheckCompileError(
                f"column {name!r} not present in the write schema"
            )
        return name

    def pred(self):
        k, v = self.peek()
        # literal op col (flipped comparison)
        if k in ("str", "num") or (k == "kw" and v in ("true", "false")):
            lit = self._literal()
            op = self.expect("cmp")
            ck, cv = self.take()
            if ck != "ident":
                raise CheckCompileError(f"expected column after {op!r}")
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return ("cmp", flip.get(op, op), self._column(cv), lit)
        if k != "ident":
            raise CheckCompileError(f"expected column, got {v!r}")
        col = self._column(self.take()[1])
        k, v = self.peek()
        if k == "cmp":
            self.take()
            return ("cmp", v, col, self._literal())
        negate = False
        if (k, v) == ("kw", "not"):
            self.take()
            negate = True
            k, v = self.peek()
        if (k, v) == ("kw", "is"):
            if negate:
                raise CheckCompileError("NOT IS is not SQL")
            self.take()
            neg = False
            if self.peek() == ("kw", "not"):
                self.take()
                neg = True
            self.expect("kw", "null")
            return ("is_null", col, neg)
        if (k, v) == ("kw", "in"):
            self.take()
            self.expect("punct", "(")
            vals = [self._literal()]
            while self.peek() == ("punct", ","):
                self.take()
                vals.append(self._literal())
            self.expect("punct", ")")
            return ("in", col, vals, negate)
        if (k, v) == ("kw", "between"):
            self.take()
            lo = self._literal()
            self.expect("kw", "and")
            hi = self._literal()
            return ("between", col, lo, hi, negate)
        raise CheckCompileError(f"expected comparison after column {col!r}")


def compile_check(predicate: str, columns: set[str]):
    """Parse ``predicate`` into a picklable AST. Raises
    :class:`CheckCompileError` for anything outside the grammar or
    referencing columns absent from ``columns``."""
    toks = _tokenize(predicate)
    if not toks:
        raise CheckCompileError("empty predicate")
    return _Parser(toks, set(columns)).parse()


def _eval(node, tbl, pa, pc):
    kind = node[0]
    if kind == "and":
        return pc.and_kleene(_eval(node[1], tbl, pa, pc), _eval(node[2], tbl, pa, pc))
    if kind == "or":
        return pc.or_kleene(_eval(node[1], tbl, pa, pc), _eval(node[2], tbl, pa, pc))
    if kind == "not":
        return pc.invert(_eval(node[1], tbl, pa, pc))
    if kind == "is_null":
        _, col, neg = node
        m = pc.is_null(tbl.column(col))
        return pc.invert(m) if neg else m
    if kind == "cmp":
        _, op, col, lit = node
        fn = {
            "=": pc.equal, "!=": pc.not_equal, "<": pc.less,
            "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
        }[op]
        return fn(tbl.column(col), _scalar(lit, tbl.column(col).type, pa))
    if kind == "in":
        _, col, vals, neg = node
        c = tbl.column(col)
        m = pc.is_in(
            c, value_set=pa.array([_py(v, c.type) for v in vals], type=c.type)
        )
        # is_in is null→False; SQL IN over null is UNKNOWN → make it null
        m = pc.if_else(pc.is_null(c), pa.scalar(None, pa.bool_()), m)
        return pc.invert(m) if neg else m
    if kind == "between":
        _, col, lo, hi, neg = node
        c = tbl.column(col)
        m = pc.and_kleene(
            pc.greater_equal(c, _scalar(lo, c.type, pa)),
            pc.less_equal(c, _scalar(hi, c.type, pa)),
        )
        return pc.invert(m) if neg else m
    raise CheckCompileError(f"unknown node {kind!r}")


def _py(lit, typ):
    import pyarrow as pa

    if isinstance(lit, (int, float)) and not isinstance(lit, bool):
        if pa.types.is_floating(typ) and isinstance(lit, int):
            return float(lit)
        if pa.types.is_integer(typ) and isinstance(lit, float) and lit.is_integer():
            return int(lit)
    return lit


def _scalar(lit, typ, pa):
    try:
        return pa.scalar(_py(lit, typ), type=typ)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError) as e:
        raise CheckCompileError(
            f"literal {lit!r} is not castable to column type {typ}: {e}"
        ) from e


def violations(compiled: dict, tbl) -> dict[str, int]:
    """Evaluate every compiled check over an Arrow table → {name:
    n_violating_rows} for checks with at least one FALSE row. NULL
    results pass (SQL CHECK)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out: dict[str, int] = {}
    for name, node in compiled.items():
        mask = _eval(node, tbl, pa, pc)
        ok = pc.fill_null(mask, True)
        bad = len(tbl) - pc.sum(pc.cast(ok, pa.int64())).as_py() if len(tbl) else 0
        if bad:
            out[name] = bad
    return out
