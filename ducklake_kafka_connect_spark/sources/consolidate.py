"""Arrow batch consolidation: contiguous-run grouping by schema (D5).

The reference buffers many small Arrow batches per table and
consolidates them before flush (``connect/BatchConsolidator.java``,
exercised by ``connect/BatchConsolidationTest.java``): batches are
grouped into CONTIGUOUS runs of compatible schemas — order is never
reshuffled across a schema change, because later batches may carry
evolved schemas and last-write-wins semantics depend on arrival order —
and each run concatenates into one batch.

Spark-side, cross-batch consolidation is native (``unionByName`` and
micro-batch triggers), so this operator's remaining job is inside
``mapInArrow``: an executor decoding thousands of tiny IPC payloads
emits a handful of right-sized record batches instead of one per
payload.

Compatibility semantics (``BatchConsolidationTest.java:637-706``):
same field count, same names IN ORDER, same types (bit width matters:
int32 ≠ int64), same nullability; field metadata is ignored.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pyarrow as pa


def _fields_compatible(a: pa.Field, b: pa.Field) -> bool:
    return (
        a.name == b.name
        and a.nullable == b.nullable
        and a.type.equals(b.type)  # metadata lives on the field, not type
    )


def schemas_compatible(a: pa.Schema, b: pa.Schema) -> bool:
    """True when batches of ``a`` and ``b`` may concatenate: equal field
    count, names in order, exact types, and nullability — metadata
    ignored (``BatchConsolidationTest.java:686-697``)."""
    if a is b:
        return True
    if len(a) != len(b):
        return False
    return all(_fields_compatible(a.field(i), b.field(i)) for i in range(len(a)))


def consolidate(batches: Iterable[pa.RecordBatch | pa.Table]) -> list[pa.Table]:
    """Concatenate contiguous runs of schema-compatible batches.

    Returns one Table per run, in input order; rows within and across
    runs keep their arrival order (``BatchConsolidationTest.java:427-454``
    ordering contract). Zero-row batches are consolidated like any other
    (they contribute no rows but do not split a run). An incompatible
    neighbor ends the run even if a later batch would match again —
    ordering beats packing."""
    out: list[pa.Table] = []
    run: list[pa.RecordBatch] = []
    run_schema: pa.Schema | None = None

    def flush():
        nonlocal run, run_schema
        if run:
            out.append(pa.Table.from_batches(run, schema=run_schema))
            run, run_schema = [], None

    for b in batches:
        rbs = b.to_batches() if isinstance(b, pa.Table) else [b]
        schema = b.schema
        if run_schema is not None and not schemas_compatible(run_schema, schema):
            flush()
        if run_schema is None:
            run_schema = schema
        if not rbs:  # empty Table still anchors/extends a run
            rbs = [pa.RecordBatch.from_pydict({f.name: [] for f in schema}, schema=schema)]
        run.extend(rbs)
    flush()
    return out


def consolidate_stream(
    batches: Iterable[pa.RecordBatch], max_rows: int = 65_536
) -> Iterator[pa.RecordBatch]:
    """Streaming form for ``mapInArrow`` hot paths: buffer compatible
    batches up to ``max_rows`` and emit them combined — bounded memory,
    same contiguous-run contract."""
    run: list[pa.RecordBatch] = []
    run_schema: pa.Schema | None = None
    n = 0

    def emit():
        nonlocal run, n
        if run:
            tbl = pa.Table.from_batches(run, schema=run_schema)
            yield from tbl.combine_chunks().to_batches(max_chunksize=max_rows)
            run, n = [], 0

    for b in batches:
        if run_schema is not None and (
            not schemas_compatible(run_schema, b.schema) or n >= max_rows
        ):
            yield from emit()
            run_schema = None
        if run_schema is None:
            run_schema = b.schema
        run.append(b)
        n += b.num_rows
    yield from emit()
