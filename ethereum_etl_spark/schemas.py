"""Schema registry for the CDC engine.

The reference declares fixed per-entity schemas twice (SQLAlchemy models in
src/schemas/sql/*.py and raw DDL in src/repositories/sqlite/*.py) and is
tolerant of missing fields at extract time (src/tasks/extract/block.py:29-34).
We formalize that posture: explicit StructTypes, plus a *versioned* schema
registry whose change records drive Iceberg-style ``ADD COLUMN`` /
``RENAME COLUMN`` evolution on the target table (the north rule's ``lang``
column case).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Core table schemas (FIXTURES.md F1-F5)
# ---------------------------------------------------------------------------

#: F1 — the WAL / binlog stream. Append-only, totally ordered by `seq`.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # insert|update|delete
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),  # null for deletes
        T.StructField("lang", T.StringType(), True),  # post-evolution only
    ]
)

#: F2 — target `pages` table, schema version 1 (pre-evolution: no `lang`).
PAGES_SCHEMA_V1 = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),  # winning event offset
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

#: F2 — schema version 2 (after the `add_column lang` change record).
PAGES_SCHEMA_V2 = T.StructType(
    list(PAGES_SCHEMA_V1.fields) + [T.StructField("lang", T.StringType(), True)]
)

#: F3 — per-file, per-epoch lineage rows (file-granular stats, the
#: Iceberg-manifest posture: offsets/rows/bytes come from parquet
#: footers, so lineage costs zero payload scans).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("file", T.StringType(), False),
        T.StructField("start_seq", T.LongType(), False),
        T.StructField("end_seq", T.LongType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
        # exact events processed by the epoch (= ledger n_events): file
        # rows/bytes tile the WAL whole-file, so a boundary epoch's file
        # stats can exceed what it processed — this column is the truth
        T.StructField("epoch_n_events", T.LongType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Versioned schema registry (FIXTURES.md F4)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchemaChange:
    """One change-schema record: applies from `effective_seq` onward."""

    schema_version: int
    effective_seq: int
    change: dict  # {"add_column": {...}} | {"rename_column": {...}} | {"drop_column": {...}}

    def to_json(self) -> str:
        return json.dumps(
            {
                "schema_version": self.schema_version,
                "effective_seq": self.effective_seq,
                "change": self.change,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "SchemaChange":
        d = json.loads(s)
        return SchemaChange(d["schema_version"], d["effective_seq"], d["change"])


_SPARK_TYPES = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "decimal(38,0)": T.DecimalType(38, 0),
}


@dataclass
class SchemaRegistry:
    """Ordered list of schema versions for the target table.

    ``schema_at(seq)`` resolves the StructType in effect at a WAL offset;
    the merge writer calls it per epoch and applies evolution DDL
    (add/rename/drop) to the target before merging the epoch that requires it.
    """

    base_schema: T.StructType
    changes: list[SchemaChange] = field(default_factory=list)

    def add_change(self, change: SchemaChange) -> None:
        if self.changes and change.schema_version <= self.changes[-1].schema_version:
            raise ValueError("schema_version must be monotonically increasing")
        self.changes.append(change)

    def version_at(self, seq: int) -> int:
        v = 1
        for c in self.changes:
            if seq >= c.effective_seq:
                v = c.schema_version
        return v

    def schema_at(self, seq: int) -> T.StructType:
        schema = T.StructType(list(self.base_schema.fields))
        for c in self.changes:
            if seq < c.effective_seq:
                break
            schema = apply_change(schema, c.change)
        return schema

    def to_json(self) -> str:
        return json.dumps(
            {
                "base_schema": self.base_schema.json(),
                "changes": [json.loads(c.to_json()) for c in self.changes],
            }
        )

    @staticmethod
    def from_json(s: str) -> "SchemaRegistry":
        d = json.loads(s)
        reg = SchemaRegistry(base_schema=T.StructType.fromJson(json.loads(d["base_schema"])))
        for c in d["changes"]:
            reg.changes.append(SchemaChange(c["schema_version"], c["effective_seq"], c["change"]))
        return reg


def schema_for_version(registry: "SchemaRegistry | None", version: int) -> T.StructType:
    """StructType of a registry's schema at a given VERSION number
    (``schema_at`` resolves by WAL seq; this resolves by version id)."""
    if registry is None:
        raise ValueError("registry required to resolve schema versions")
    schema = T.StructType(list(registry.base_schema.fields))
    for c in registry.changes:
        if c.schema_version <= version:
            schema = apply_change(schema, c.change)
    return schema


def conform_to_schema(df, registry: "SchemaRegistry", version: int):
    """Conform a WAL-projected DataFrame to the schema at `version`:
    follow the registry's rename chain for columns written under an old
    name, then null-fill any still-missing columns — the reference's
    tolerant ``.get()`` extract posture (src/tasks/extract/block.py:
    29-34) formalized against the versioned registry. Pure column ops;
    adds no shuffle or job."""
    from pyspark.sql import functions as F

    schema = schema_for_version(registry, version)
    for ch in registry.changes:
        if ch.schema_version <= version and "rename_column" in ch.change:
            spec = ch.change["rename_column"]
            if spec["from"] in df.columns and spec["to"] not in df.columns:
                df = df.withColumnRenamed(spec["from"], spec["to"])
    types = {f.name: f.dataType for f in schema.fields}
    for c in schema.fieldNames():
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(types[c]))
    return df


def apply_change(schema: T.StructType, change: dict) -> T.StructType:
    """Apply one ADD/RENAME COLUMN change record to a StructType."""
    if "add_column" in change:
        spec = change["add_column"]
        if spec["name"] in schema.fieldNames():
            return schema
        return T.StructType(
            list(schema.fields)
            + [T.StructField(spec["name"], _SPARK_TYPES[spec["type"]], True)]
        )
    if "rename_column" in change:
        spec = change["rename_column"]
        return T.StructType(
            [
                T.StructField(spec["to"] if f.name == spec["from"] else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
    if "drop_column" in change:
        spec = change["drop_column"]
        if spec["name"] not in schema.fieldNames():
            raise ValueError(f"drop_column: no such column {spec['name']!r}")
        return T.StructType([f for f in schema.fields if f.name != spec["name"]])
    raise ValueError(f"unknown schema change: {change}")
