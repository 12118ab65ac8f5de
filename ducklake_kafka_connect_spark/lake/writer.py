"""Write path: auto-create / evolve → route MERGE-vs-INSERT → commit.

Parity targets (reference ``ingestor/DucklakeWriter.java``):

- D3 routing (:85-96): MERGE only when PK columns are configured AND the
  table pre-existed; otherwise plain INSERT (append).
- D2 MERGE (:98-187): name-mapped upsert on the PK equi-join;
- D6 (:116-137): PK columns and ``_inserted_at`` never updated on match;
- B10 (:147-148,213-214): ``_inserted_at = NOW()`` stamped on insert only;
- D5: batch consolidation is ``unionByName`` / a single micro-batch;
- C8-C11: auto-create + ADD COLUMN + widening via ``schema/reconcile.py``.

MERGE physical strategy (the 100 TB design):

The source micro-batch is small relative to the table, so every join
broadcasts the source — the target is **never shuffled**. (Batches
above MERGE_BROADCAST_ROWS — bulk backfills — degrade to ordinary
shuffle joins instead of OOMing the driver as a broadcast.) Affected
partitions are computed from (a) the source rows' partition values and
(b) a column-pruned scan of target (pk + partition columns) semi-joined
against the broadcast source keys — so keys whose update moves them
across partitions delete their old copy. Only affected partitions are
re-read (file pruning happens driver-side against the manifest) and
rewritten; untouched partitions keep their immutable files. Plan shape:

    scan(target, affected-partitions only)  ──┐
    broadcast(src) ── left_anti (untouched) ──┤
    broadcast(src) ── inner   (matched)     ──┼─ unionByName → write
    broadcast(src) ── left_anti (inserts)   ──┘

At 1000 executors this is one pruned scan + three broadcast hash joins —
no shuffle of table data, no sort. Pruning is two-level: partition dirs
(from the manifest) and files (parquet-footer min/max of the first PK
column, harvested at write time into the manifest) — only files whose
key range overlaps the batch are rewritten; everything else carries its
immutable files into the next snapshot untouched.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..metrics import REGISTRY
from ..schema.reconcile import INSERTED_AT, plan_evolution
from .partitioning import (
    dir_key_to_partition_tuple,
    partition_column_names,
    with_partition_columns,
)
from .table import LakeTable, Manifest, is_complex, to_physical_schema

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
# Above this many affected partitions, skip per-partition pruning and
# rewrite via a full-table pass (the OR-filter would not be worth it).
MAX_PRUNED_PARTITIONS = 1024
# above this many source rows a MERGE batch is shuffle-joined, not broadcast
MERGE_BROADCAST_ROWS = 4_000_000
# batches up to this many rows Bloom-probe overlap files to shrink the
# rewrite set (one driver-side key collect + sidecar reads)
MERGE_BLOOM_PROBE_KEYS = 100_000


def _logical_schema_of(df: DataFrame) -> T.StructType:
    return T.StructType([f for f in df.schema.fields if f.name != INSERTED_AT])


def _conform(df: DataFrame, logical: T.StructType, extra: Sequence[str] = ()) -> DataFrame:
    """Project a batch onto the table's logical schema in physical form:
    missing columns null-filled (B1), complex columns serialized to JSON
    (B9), scalars cast to the (possibly widened) table type. ``extra``
    columns (system / partition columns) pass through untouched."""
    physical = to_physical_schema(logical)
    cols = []
    taken: set[str] = set()
    df_cols = set(df.columns)
    for lf, pf in zip(logical.fields, physical.fields):
        if lf.name == INSERTED_AT:
            continue
        taken.add(lf.name)
        if lf.name not in df_cols:
            cols.append(F.lit(None).cast(pf.dataType).alias(lf.name))
        elif is_complex(lf.dataType):
            src_type = df.schema[lf.name].dataType
            if isinstance(src_type, T.StringType):
                cols.append(F.col(lf.name).alias(lf.name))  # pre-serialized
            else:
                cols.append(F.to_json(F.col(lf.name)).alias(lf.name))
        else:
            cols.append(F.col(lf.name).cast(pf.dataType).alias(lf.name))
    for name in extra:
        if name in df_cols and name not in taken:
            taken.add(name)
            cols.append(F.col(name))
    return df.select(*cols)


def _overlaps(stats, bounds, pk0: str) -> bool:
    """Can a file whose per-column stats are ``stats`` contain any key in
    bounds? Conservative: missing/uncomparable stats → True; an empty
    source key range → False (nothing can match). A None upper bound
    (truncated string stat) is unbounded above."""
    if bounds["lo"] is None:
        return False
    rng = (stats or {}).get(pk0)
    if not rng:
        return True
    try:
        lo, hi = rng[0], rng[1]
        if hi is not None and hi < bounds["lo"]:
            return False
        if lo is not None and lo > bounds["hi"]:
            return False
        return True
    except TypeError:
        return True


def _dedup_last_wins(df: DataFrame, pk: Sequence[str], order_col: str | None) -> DataFrame:
    """Collapse in-batch duplicate keys to the last write (SURVEY risk #2:
    DuckDB MERGE applies last-write; a multi-match would also break the
    join-based merge)."""
    from pyspark.sql import Window as W

    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    if order_col is None:
        df = df.withColumn("__order", F.monotonically_increasing_id())
        order = F.col("__order")
    w = W.partitionBy(*[F.col(c) for c in pk]).orderBy(order.desc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if order_col is None:
        out = out.drop("__order")
    return out


class LakeWriter:
    """Per-table writer — create/evolve + merge-vs-insert routing."""

    def __init__(
        self,
        table: LakeTable,
        pk: Sequence[str] | None = None,
        partition_by: str | list[str] | None = None,
        auto_create: bool = True,
    ):
        self.table = table
        self.pk = list(pk or [])
        self.partition_by = partition_by
        self.auto_create = auto_create

    # ---------- public API ----------

    def write(self, df: DataFrame, order_col: str | None = None) -> None:
        """Reference routing (DucklakeWriter.java:85-96): MERGE when PKs
        are configured and the table pre-existed, else plain INSERT."""
        pre_existed = self.table.exists()
        if self.pk and pre_existed:
            self.merge(df, order_col=order_col)
        else:
            self.append(df)

    def append(self, df: DataFrame) -> None:
        with REGISTRY.timer("simpleInsert"):
            self._append(df)

    def _append(self, df: DataFrame) -> None:
        manifest = self._ensure_table(df)
        out = self._prepare_insert(df, manifest)
        with self.table.lock():
            manifest = self.table.manifest()  # re-read under lock
            new_files, new_stats = self.table.write_data_files(out, manifest.version + 1)
            merged_files = {k: list(v) for k, v in manifest.files.items()}
            for k, paths in new_files.items():
                merged_files.setdefault(k, []).extend(paths)
            stats = dict(manifest.file_stats)
            stats.update(new_stats)
            self._commit_next(
                manifest, merged_files, _logical_schema_of_batch(df, manifest), stats
            )

    def merge(
        self,
        df: DataFrame,
        order_col: str | None = None,
        tombstone_col: str | None = None,
    ) -> None:
        """Upsert ``df`` by PK. With ``tombstone_col`` (boolean), rows
        flagged true DELETE their key instead — the CDC extension the
        reference lacks (SURVEY §2.G: null-valued records are not
        deletes there). Tombstones participate in last-write-wins
        ordering, so delete-then-reinsert within a batch resolves by
        ``order_col``."""
        with REGISTRY.timer("upsertWithMergeInto"):
            self._merge(df, order_col, tombstone_col)

    def _merge(
        self,
        df: DataFrame,
        order_col: str | None = None,
        tombstone_col: str | None = None,
    ) -> None:
        if not self.pk:
            raise ValueError(f"merge() on table {self.table.name} requires pk columns")
        payload = df.drop(tombstone_col) if tombstone_col else df
        manifest = self._ensure_table(payload)
        final_logical = _logical_schema_of_batch(payload, manifest)
        exprs = manifest.partition_exprs
        part_cols = partition_column_names(exprs)

        src0 = _dedup_last_wins(df, self.pk, order_col)
        if tombstone_col:
            flag = F.coalesce(F.col(tombstone_col), F.lit(False))
            dead_keys = src0.filter(flag).select(*self.pk).distinct()
            src0 = src0.filter(~flag).drop(tombstone_col)
        else:
            dead_keys = None
        src = _conform(src0, final_logical)
        src = with_partition_columns(src, exprs).cache()
        live_keys = src.select(*self.pk).distinct()
        # keys whose old copies must leave their files: updates + deletes
        src_keys = (
            live_keys.unionByName(dead_keys).distinct() if dead_keys is not None else live_keys
        )

        # ---- file-level pruning on PK range (parquet footer stats) ----
        # A target row can only match a source key if its file's
        # [min, max] of pk[0] overlaps the batch's key range; files
        # without stats are conservatively kept. Bounds and the batch's
        # partition set come from ONE aggregate job over the cached
        # source (separate jobs only on the rare tombstone path, where
        # dead keys are outside ``src``).
        pk0 = self.pk[0]
        if dead_keys is None and part_cols:
            row = src.agg(
                F.min(pk0).alias("lo"),
                F.max(pk0).alias("hi"),
                F.count(F.lit(1)).alias("n_src"),
                F.collect_set(F.struct(*part_cols)).alias("parts"),
            ).collect()[0]
            bounds = row
            n_src = row["n_src"]
            src_parts = [p.asDict() for p in row["parts"]]
        else:
            bounds = src_keys.agg(
                F.min(pk0).alias("lo"),
                F.max(pk0).alias("hi"),
                F.count(F.lit(1)).alias("n_src"),
            ).collect()[0]
            n_src = bounds["n_src"]
            src_parts = (
                [r.asDict() for r in src.select(*part_cols).distinct().collect()]
                if part_cols
                else []
            )
        # Micro-batches broadcast (hash-join against only the rewrite
        # files, no shuffle of the table); a bulk backfill batch above
        # the row threshold would OOM the driver as a broadcast, so it
        # degrades to ordinary shuffle joins instead.
        bcast = F.broadcast if n_src <= MERGE_BROADCAST_ROWS else (lambda d: d)
        overlap_by_part = {
            k: [f for f in v if _overlaps(manifest.file_stats.get(f), bounds, pk0)]
            for k, v in manifest.files.items()
        }
        # Small batches additionally Bloom-probe the surviving files:
        # after interleaved appends every file's PK range overlaps every
        # batch, but the sidecars prove which files actually hold the
        # keys — the rewrite set shrinks to true containers. One driver
        # job collects the keys; skipped for bulk batches.
        n_overlap = sum(len(v) for v in overlap_by_part.values())
        if 0 < n_src <= MERGE_BLOOM_PROBE_KEYS and n_overlap > 1:
            from .bloom import membership_filter

            key_vals = [r[0] for r in src_keys.select(pk0).collect()]
            flat = [f for v in overlap_by_part.values() for f in v]
            keep = dict(
                zip(
                    flat,
                    membership_filter(
                        [os.path.join(self.table.dir, f) for f in flat], key_vals
                    ),
                )
            )
            overlap_by_part = {
                k: [f for f in v if keep[f]] for k, v in overlap_by_part.items()
            }

        # ---- affected partitions (driver-side partition pruning) ----
        if part_cols:
            affected = {
                tuple(str(p[c]) if p[c] is not None else HIVE_NULL for c in part_cols)
                for p in src_parts
            }
            # Old copies of updated keys may live in partitions the new
            # rows don't touch (partition-value drift). Only files
            # OUTSIDE the already-affected partitions can add to the
            # rewrite set — scan just those; usually there are none and
            # the probe job is skipped entirely.
            outside_files = [
                f
                for k, v in overlap_by_part.items()
                if self._part_tuple(k, manifest) not in affected
                for f in v
            ]
            if outside_files:
                target_outside = self._read_files(manifest, outside_files)
                matched_parts = (
                    target_outside.select(*self.pk, *part_cols)
                    .join(bcast(src_keys), on=self.pk, how="left_semi")
                    .select(*part_cols)
                    .distinct()
                    .collect()
                )
                affected |= {
                    tuple(str(r[c]) if r[c] is not None else HIVE_NULL for c in part_cols)
                    for r in matched_parts
                }
            if len(affected) > MAX_PRUNED_PARTITIONS:
                rewrite_files = [f for v in overlap_by_part.values() for f in v]
            else:
                rewrite_files = [
                    f
                    for k, v in overlap_by_part.items()
                    if self._part_tuple(k, manifest) in affected
                    for f in v
                ]
        else:
            affected = None  # unpartitioned → every overlapping file
            rewrite_files = [f for v in overlap_by_part.values() for f in v]

        rewrite_set = set(rewrite_files)
        target = self._read_files(manifest, rewrite_files)
        # Conform the target side to the evolved schema too: null-fill
        # added columns, cast widened ones; keep system/partition columns.
        passthrough = [INSERTED_AT] + [c for c in part_cols if c not in final_logical.fieldNames()]
        target = _conform(target, final_logical, extra=passthrough)

        # ---- the three broadcast joins ----
        untouched = target.join(bcast(src_keys), on=self.pk, how="left_anti")
        ins_lookup = target.select(*self.pk, INSERTED_AT)
        matched = (
            ins_lookup.join(bcast(src), on=self.pk, how="inner")
            .select(*[F.col(c) for c in src.columns if c != INSERTED_AT], F.col(INSERTED_AT))
        )
        inserts = (
            src.join(bcast(ins_lookup.select(*self.pk)), on=self.pk, how="left_anti")
            .withColumn(INSERTED_AT, F.current_timestamp())
        )
        out_cols = (
            [f.name for f in to_physical_schema(final_logical).fields]
            + [INSERTED_AT]
            + [c for c in part_cols if c not in final_logical.fieldNames()]
        )
        merged = (
            untouched.selectExpr(*out_cols)
            .unionByName(matched.selectExpr(*out_cols))
            .unionByName(inserts.selectExpr(*out_cols))
        )

        with self.table.lock():
            manifest = self.table.manifest()
            new_files, new_stats = self.table.write_data_files(merged, manifest.version + 1)
            # keep every file that was not rewritten (including
            # non-overlapping files inside affected partitions)
            merged_files = {
                k: [f for f in v if f not in rewrite_set]
                for k, v in manifest.files.items()
            }
            merged_files = {k: v for k, v in merged_files.items() if v}
            for k, paths in new_files.items():
                merged_files.setdefault(k, []).extend(paths)
            stats = {
                f: s for f, s in manifest.file_stats.items() if f not in rewrite_set
            }
            stats.update(new_stats)
            self._commit_next(manifest, merged_files, final_logical, stats)
        src.unpersist()

    # ---------- internals ----------

    def _ensure_table(self, df: DataFrame) -> Manifest:
        if not self.table.exists():
            if not self.auto_create:
                raise ValueError(
                    f"Table {self.table.name} does not exist and auto-create is disabled"
                )
            with REGISTRY.timer("createTable"):
                self.table.create(
                    _logical_schema_of(df), pk=self.pk, partition_by=self.partition_by
                )
        return self.table.manifest()

    def _prepare_insert(self, df: DataFrame, manifest: Manifest) -> DataFrame:
        final_logical = _logical_schema_of_batch(df, manifest)
        out = _conform(df, final_logical).withColumn(INSERTED_AT, F.current_timestamp())
        return with_partition_columns(out, manifest.partition_exprs)

    def _commit_next(
        self,
        manifest: Manifest,
        files: dict[str, list[str]],
        final_logical: T.StructType,
        file_stats: dict | None = None,
    ) -> None:
        fields = [f for f in final_logical.fields if f.name != INSERTED_AT]
        fields.append(T.StructField(INSERTED_AT, T.TimestampType(), True))
        self.table._commit(
            Manifest(
                version=manifest.version + 1,
                schema=T.StructType(fields),
                pk=manifest.pk or self.pk,
                partition_spec=manifest.partition_spec,
                files=files,
                parent=manifest.version,
                props=manifest.props,
                file_stats=file_stats if file_stats is not None else manifest.file_stats,
            )
        )

    def _part_tuple(self, part_key: str, manifest: Manifest) -> tuple:
        return dir_key_to_partition_tuple(part_key, manifest.partition_exprs)

    def _read_files(self, manifest: Manifest, rel_files: list[str]) -> DataFrame:
        """Read an explicit file list under the manifest's read schema."""
        read_schema = self.table.read_schema(manifest)
        if not rel_files:
            return self.table.spark.createDataFrame([], read_schema)
        import os

        files = [os.path.join(self.table.dir, p) for p in rel_files]
        return self.table.spark.read.schema(read_schema).parquet(*files)


def _logical_schema_of_batch(df: DataFrame, manifest: Manifest) -> T.StructType:
    """Reconcile the incoming batch's logical schema against the stored
    schema → final (possibly evolved) logical schema. Raises on
    incompatible evolution (caller DLQs)."""
    incoming = _logical_schema_of(df)
    existing = T.StructType([f for f in manifest.schema.fields if f.name != INSERTED_AT])
    return plan_evolution(existing, incoming).final_schema
