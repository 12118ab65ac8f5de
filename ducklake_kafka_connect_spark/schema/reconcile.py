"""Table-evolution reconciliation: incoming batch schema vs stored table schema.

Behavioral parity with ``ingestor/DucklakeTableManager.java:236-364``:

- New columns → ADD COLUMN (nullable).
- Existing columns compared type-by-type with decisions
  COMPATIBLE_KEEP / UPGRADE / INCOMPATIBLE (:324-347):
  * integer widening along Byte < Short < Integer < Long (:337-343),
  * Float → Double (:344),
  * a *narrower* incoming type is tolerated as KEEP (:342,345),
  * the JSON guard: a column stored as serialized JSON (complex types are
    stored as JSON text, README.md:8) never converts to or from any other
    type (:334-336),
  * everything else → INCOMPATIBLE (raises; caller DLQs the batch).
- ``_inserted_at`` is engine-owned and never part of reconciliation.

Output is an ``EvolutionPlan``: columns to add, columns to widen, and the
final table schema — the lake layer applies it as metadata-only changes
(adds) plus a cast-on-read / rewrite for widenings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T

INSERTED_AT = "_inserted_at"

_INT_WIDTH = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4}


class EvolutionDecision(Enum):
    COMPATIBLE_KEEP = "keep"
    UPGRADE = "upgrade"
    INCOMPATIBLE = "incompatible"


class ReconcileError(ValueError):
    """Incompatible table evolution. Carries the conflicting column and
    both types so callers can enrich the DLQ message with sample values
    from the offending batch (reference ImprovedErrorMessageTest)."""

    def __init__(
        self,
        message: str,
        field: str | None = None,
        existing: T.DataType | None = None,
        incoming: T.DataType | None = None,
    ):
        self.field = field
        self.existing = existing
        self.incoming = incoming
        super().__init__(message)


def _is_json_column(dtype: T.DataType) -> bool:
    """Complex types are persisted as JSON text columns (reference README.md:8);
    the lake layer tags them via metadata {"ducklake.json": true}."""
    return isinstance(dtype, (T.StructType, T.ArrayType, T.MapType))


def decide_column(existing: T.DataType, incoming: T.DataType) -> EvolutionDecision:
    """Evolution decision for one column (DucklakeTableManager.java:324-347)."""
    if existing == incoming:
        return EvolutionDecision.COMPATIBLE_KEEP

    existing_json = _is_json_column(existing)
    incoming_json = _is_json_column(incoming)
    if existing_json or incoming_json:
        # JSON ↔ anything is always incompatible unless identical.
        return EvolutionDecision.INCOMPATIBLE

    e_int = _INT_WIDTH.get(type(existing))
    i_int = _INT_WIDTH.get(type(incoming))
    if e_int is not None and i_int is not None:
        return (
            EvolutionDecision.UPGRADE
            if i_int > e_int
            else EvolutionDecision.COMPATIBLE_KEEP
        )

    if isinstance(existing, T.FloatType) and isinstance(incoming, T.DoubleType):
        return EvolutionDecision.UPGRADE
    if isinstance(existing, T.DoubleType) and isinstance(incoming, T.FloatType):
        return EvolutionDecision.COMPATIBLE_KEEP

    if isinstance(existing, T.DecimalType) and isinstance(incoming, T.DecimalType):
        # widen to the union of integral digits and scale; KEEP when the
        # stored type already covers the incoming one
        return (
            EvolutionDecision.COMPATIBLE_KEEP
            if combined_decimal(existing, incoming) == existing
            else EvolutionDecision.UPGRADE
        )

    return EvolutionDecision.INCOMPATIBLE


def combined_decimal(a: T.DecimalType, b: T.DecimalType) -> T.DecimalType:
    """Smallest decimal covering both: max integral digits + max scale,
    capped at Spark's 38-digit limit (scale preserved under the cap)."""
    scale = max(a.scale, b.scale)
    integral = max(a.precision - a.scale, b.precision - b.scale)
    return T.DecimalType(min(38, integral + scale), scale)


def widen_target(existing: T.DataType, incoming: T.DataType) -> T.DataType:
    """Type a column widens TO on UPGRADE — the incoming type, except
    decimals, whose union may be wider than either side
    ((10,2) ∪ (8,4) → (12,4))."""
    if isinstance(existing, T.DecimalType) and isinstance(incoming, T.DecimalType):
        return combined_decimal(existing, incoming)
    return incoming


@dataclass
class EvolutionPlan:
    add_columns: list[T.StructField] = field(default_factory=list)
    widen_columns: dict[str, T.DataType] = field(default_factory=dict)
    final_schema: T.StructType = field(default_factory=lambda: T.StructType([]))

    @property
    def is_noop(self) -> bool:
        return not self.add_columns and not self.widen_columns


def plan_evolution(existing: T.StructType, incoming: T.StructType) -> EvolutionPlan:
    """Diff incoming batch schema against the stored table schema.

    Raises ReconcileError on any INCOMPATIBLE column — the caller routes
    the batch (or offending records) to the DLQ, mirroring the
    reference's schema-conflict triage (DucklakeSinkTask.java:969-1097).
    """
    existing_by_name = {f.name: f for f in existing.fields}
    plan = EvolutionPlan()
    final_fields = {f.name: f for f in existing.fields}

    for f in incoming.fields:
        if f.name == INSERTED_AT:
            continue
        cur = existing_by_name.get(f.name)
        if cur is None:
            new_field = T.StructField(f.name, f.dataType, nullable=True)
            plan.add_columns.append(new_field)
            final_fields[f.name] = new_field
            continue
        decision = decide_column(cur.dataType, f.dataType)
        if decision is EvolutionDecision.UPGRADE:
            target = widen_target(cur.dataType, f.dataType)
            plan.widen_columns[f.name] = target
            final_fields[f.name] = T.StructField(f.name, target, nullable=cur.nullable)
        elif decision is EvolutionDecision.INCOMPATIBLE:
            raise ReconcileError(
                f"Incompatible schema evolution for column '{f.name}': "
                f"{cur.dataType.simpleString()} -> {f.dataType.simpleString()}",
                field=f.name,
                existing=cur.dataType,
                incoming=f.dataType,
            )

    plan.final_schema = T.StructType(list(final_fields.values()))
    return plan


def sample_column_values(df, column: str, max_samples: int = 5) -> list:
    """Up to ``max_samples`` distinct non-null values of ``column`` from
    the offending batch — one bounded driver collect, used to enrich
    ReconcileError/SchemaUnificationError messages for DLQ rows."""
    if column not in df.columns:
        return []
    try:
        return [
            r[0]
            for r in df.select(column)
            .where(df[column].isNotNull())
            .distinct()
            .limit(max_samples)
            .collect()
        ]
    except Exception:  # noqa: BLE001 — enrichment must never mask the error
        return []


def enriched_reconcile_message(err: ReconcileError, df, max_samples: int = 5) -> str:
    """``err`` message + field name, both types, and sample values from
    the batch (SinkRecordToArrowConverter.java:305-385 parity)."""
    if not err.field:
        return str(err)
    samples = sample_column_values(df, err.field, max_samples)
    shown = ", ".join(repr(s)[:80] for s in samples)
    return f"{err}; sample values of '{err.field}': [{shown}]"


def reconcile_schemas(existing: T.StructType, incoming: T.StructType) -> T.StructType:
    """Convenience: the post-evolution table schema (raises if incompatible)."""
    return plan_evolution(existing, incoming).final_schema
