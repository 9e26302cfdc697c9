"""Canonical transcript / change-event schemas and additive schema evolution.

TinyETL's schema system (reference: /root/reference/src/schema.rs:341-346,
:461-554) infers a schema from a 1000-row sample and forces everything
nullable. The new engine instead *declares* the transcript schema (from
BASELINE.json input_hint) and supports **additive evolution**: later change
epochs may carry extra nullable columns; earlier rows backfill null.
This replaces the reference's first-transformed-row schema adoption
(/root/reference/src/transfer.rs:62-86) with a deterministic union rule.
"""

from __future__ import annotations

import pyarrow as pa

# --- canonical transcript table (BASELINE.json input_hint) -----------------
KEY_COLS = ["conv_id", "turn_idx"]

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# --- change-event log: lsn (replay-order authority) + op + key + payload ---
# Mirrors FIXTURES.md §A2. ``lsn`` plays the role the reference's keyset
# cursor played (/root/reference/src/connectors/odbc.rs:233-256): a totally
# ordered replay position.
CHANGE_META_FIELDS = [
    pa.field("lsn", pa.int64(), nullable=False),
    pa.field("op", pa.string(), nullable=False),  # "upsert" | "delete"
]

CHANGE_SCHEMA = pa.schema(
    CHANGE_META_FIELDS
    + [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)

VALID_OPS = ("upsert", "delete")


def payload_fields(change_schema: pa.Schema) -> list[pa.Field]:
    """Payload = everything except lsn/op; this is the transcript row shape."""
    return [change_schema.field(n) for n in change_schema.names if n not in ("lsn", "op")]


def evolve(base: pa.Schema, extra: pa.Schema) -> pa.Schema:
    """Additive union of two schemas.

    Columns of ``base`` keep position and type; new columns from ``extra``
    are appended (order of first appearance) as **nullable** fields.
    A same-named column with a different type is an error — the engine only
    supports *additive* evolution (new tool/metadata columns), matching the
    north rule. (The reference instead coerces mixed types to String at
    inference time — /root/reference/src/schema.rs:520-543 — which silently
    loses typing; we refuse instead.)
    """
    fields = list(base)
    names = set(base.names)
    for f in extra:
        if pa.types.is_null(f.type) and f.name in names:
            continue  # an all-null column casts to any declared type
        if f.name in names:
            existing = base.field(f.name)
            if pa.types.is_null(existing.type) and not pa.types.is_null(f.type):
                # symmetric null exemption: a column that arrived all-null
                # FIRST adopts the later epoch's declared type (the
                # null-in-extra direction is handled above)
                idx = base.get_field_index(f.name)
                fields[idx] = pa.field(f.name, f.type, nullable=True)
                continue
            if existing.type != f.type:
                raise TypeError(
                    f"non-additive schema change for column {f.name!r}: "
                    f"{existing.type} -> {f.type}"
                )
            continue
        fields.append(pa.field(f.name, f.type, nullable=True))
        names.add(f.name)
    return pa.schema(fields)


def strip_metadata(schema: pa.Schema) -> pa.Schema:
    """Drop schema- and field-level metadata (e.g. pandas metadata riding on
    parquet footers). Dict-valued field metadata makes the schema unhashable,
    which defeats Ray's schema-dedup during shuffles — every reduce task
    re-ships the schema and logs a warning."""
    return pa.schema([pa.field(f.name, f.type, nullable=f.nullable) for f in schema])


def evolve_all(schemas: list[pa.Schema]) -> pa.Schema:
    out = strip_metadata(schemas[0])
    for s in schemas[1:]:
        out = evolve(out, strip_metadata(s))
    return out


def align_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: missing columns backfilled as nulls,
    column order normalized, types cast (safe). Extra columns not present in
    ``schema`` are dropped (caller should have evolved the schema first if it
    wanted them kept)."""
    n = table.num_rows
    arrays = []
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def transcript_schema_of(change_schema: pa.Schema) -> pa.Schema:
    """The merged-table schema produced by replaying a change log with
    ``change_schema``: its payload fields, everything nullable except keys."""
    fields = []
    for f in payload_fields(change_schema):
        nullable = f.name not in KEY_COLS
        fields.append(pa.field(f.name, f.type, nullable=nullable))
    return pa.schema(fields)
