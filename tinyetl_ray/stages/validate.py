"""Declared-schema validation — TinyETL's schema-file enforcement, vectorized.

Reference semantics (/root/reference/src/schema.rs:148-244, applied per row in
src/transfer.rs:154-159): required-column check, default injection for
null/missing values, type check, regex pattern check; any failure aborts the
run. Schema files are YAML ``columns: [{name, type, nullable, pattern,
default}]`` (src/schema.rs:63-76).

Here the whole check is one vectorized ``map_batches`` stage: defaults via
``fill_null``, patterns via ``pc.match_substring_regex`` (anchored), types
via Arrow cast. ``on_error`` mirrors decode: "raise" (reference behavior) or
"drop" (dead-letter the bad rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

_TYPES: dict[str, pa.DataType] = {
    # the reference's 8 dynamic types (src/schema.rs:11-21), Arrow-mapped the
    # way its own Arrow boundary does (src/schema.rs:24-60)
    "string": pa.string(),
    "integer": pa.int64(),
    "decimal": pa.float64(),
    "boolean": pa.bool_(),
    "date": pa.timestamp("us"),
    "datetime": pa.timestamp("us"),
    "json": pa.string(),
}


@dataclass
class ColumnSpec:
    name: str
    type: str = "string"
    nullable: bool = True
    pattern: str | None = None
    default: Any = None
    # decimal-only: declared precision/scale makes `decimal` a REAL
    # fixed-point Arrow decimal128 (the reference's rust_decimal analog,
    # src/schema.rs:29); without them it degrades to float64 as before
    precision: int | None = None
    scale: int | None = None

    def arrow_type(self) -> pa.DataType:
        if self.type == "decimal" and self.precision is not None:
            return pa.decimal128(self.precision, self.scale or 0)
        if self.type not in _TYPES:
            raise ValueError(
                f"unknown type {self.type!r} for column {self.name!r}; "
                f"expected one of {sorted(_TYPES)}"
            )
        return _TYPES[self.type]


def json_columns(schema: pa.Schema) -> list[str]:
    """Columns marked ``tinyetl:type=json`` in field metadata — survives a
    parquet round trip (pyarrow serializes the Arrow schema into the file),
    so a reader can re-type declared-JSON string columns."""
    out = []
    for f in schema:
        md = f.metadata or {}
        if md.get(b"tinyetl:type") == b"json":
            out.append(f.name)
    return out


class SchemaValidator:
    """``map_batches(SchemaValidator(specs), batch_format="pyarrow")``."""

    def __init__(self, specs: list[ColumnSpec | dict], on_error: str = "raise"):
        self.specs = [s if isinstance(s, ColumnSpec) else ColumnSpec(**s) for s in specs]
        for s in self.specs:
            s.arrow_type()  # validate eagerly (reference validates at load,
            # src/schema.rs:91-115)
        if on_error not in ("raise", "drop"):
            raise ValueError("on_error must be raise|drop")
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ok = pa.array([True] * n)
        cols = []
        for spec in self.specs:
            typ = spec.arrow_type()
            if spec.name in batch.column_names:
                col = batch.column(spec.name).combine_chunks()
            else:
                col = pa.nulls(n, pa.string())
            # 1) default injection for nulls (reference: schema.rs:197-205)
            if spec.default is not None and col.null_count:
                col = pc.fill_null(col, pa.scalar(str(spec.default), pa.string())
                                   if pa.types.is_string(col.type) else spec.default)
            # 2) type coercion (string-typed inputs cast to declared type)
            if col.type != typ:
                try:
                    col = col.cast(typ)
                except pa.ArrowInvalid as err:
                    if self.on_error == "raise":
                        raise ValueError(
                            f"column {spec.name!r} failed cast to {spec.type}: {err}"
                        ) from err
                    # per-row salvage: keep parseable rows, null the rest
                    safe = pa.nulls(n, typ)
                    mask = pa.array([False] * n)
                    try:
                        import pandas as pd

                        if typ in (pa.int64(), pa.float64()):
                            # vectorized numeric path
                            conv = pd.to_numeric(col.to_pandas(), errors="coerce")
                            mask = pa.array(conv.notna().to_numpy())
                            safe = pa.array(conv, typ, from_pandas=True)
                        else:
                            # generic per-value salvage for every other
                            # declared type (datetime/date/bool/decimal/...).
                            # Cold path: only a failed whole-batch cast with
                            # on_error="drop" reaches it — a blanket retry of
                            # the batch cast here would re-raise on the one
                            # bad value and null EVERY row.
                            out: list = []
                            good: list[bool] = []
                            for v in col.to_pylist():
                                try:
                                    out.append(
                                        pa.scalar(v, col.type).cast(typ).as_py()
                                    )
                                    good.append(v is not None)
                                except (
                                    pa.ArrowInvalid,
                                    pa.ArrowNotImplementedError,
                                    ValueError,
                                    TypeError,
                                    OverflowError,
                                ):
                                    out.append(None)
                                    good.append(False)
                            mask = pa.array(good)
                            safe = pa.array(out, typ)
                    except Exception:
                        pass
                    ok = pc.and_(ok, pc.or_(mask, pa.array([spec.nullable] * n)))
                    col = safe
            # 3) required (non-nullable) check (schema.rs:163-171)
            if not spec.nullable:
                ok = pc.and_(ok, pc.is_valid(col))
            # 4) anchored pattern check on string columns (schema.rs:213-231)
            if spec.pattern:
                scol = col if pa.types.is_string(col.type) else col.cast(pa.string())
                m = pc.match_substring_regex(scol, f"^(?:{spec.pattern})$")
                m = pc.fill_null(m, spec.nullable)  # nulls pass iff nullable
                ok = pc.and_(ok, m)
            # 5) json-typed columns: every non-null value must parse as JSON
            # (schema.rs:168-189). Parsing is inherently per-value; this runs
            # only for declared-json columns in a validation stage.
            if spec.type == "json":
                import json as _json

                def _is_json(v) -> bool:
                    try:
                        _json.loads(v)
                        return True
                    except (ValueError, TypeError):
                        return False

                vals = col.to_pylist()
                m = pa.array(
                    [True if v is None else _is_json(v) for v in vals]
                )
                ok = pc.and_(ok, m)
            cols.append((spec.name, col))
        fields = []
        for spec, (name, col) in zip(self.specs, cols):
            f = pa.field(name, col.type, nullable=True)
            if spec.type == "json":
                # round-trip marker the reference stores in parquet field
                # metadata (src/schema.rs:318-329, connectors/parquet.rs:46-77)
                f = f.with_metadata({b"tinyetl:type": b"json"})
            fields.append(f)
        out = pa.Table.from_arrays([c for _, c in cols], schema=pa.schema(fields))
        ok = pc.fill_null(ok, False)
        n_bad = n - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
        if n_bad:
            if self.on_error == "raise":
                bad = batch.filter(pc.invert(ok)).slice(0, 3)
                raise ValueError(f"{n_bad} rows failed schema validation; first: "
                                 f"{bad.to_pylist()}")
            out = out.filter(ok)
        return out
