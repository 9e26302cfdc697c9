"""Extension-dispatched sources/sinks + dynamic type sniffing.

TinyETL's connector factory picks a Source/Target by file extension
(/root/reference/src/connectors/mod.rs:67-161) and its CSV reader sniffs
field types value-by-value (int → decimal → bool → date → null → string,
src/connectors/csv.rs:82-111) with a 13-format date parser
(src/date_parser.rs:11-116).

Ray-native version: ``read_any``/``write_any`` dispatch to
``ray.data.read_{parquet,csv,json}`` / ``Dataset.write_*`` (streaming,
distributed, no whole-file buffering — unlike the reference's Parquet/JSON
targets which buffer the entire dataset in RAM,
src/connectors/parquet.rs:456-464, json.rs:243-247). Type sniffing is
two-phase: ``sniff_column_types`` runs a distributed consensus vote over
every block (tiny per-block bitmask rows, no data materialized), then
``ApplyTypes`` applies the one agreed column→type mapping uniformly —
a deterministic, column-consistent strengthening of the reference's
per-value vote (mixed columns stay strings both here and there,
src/schema.rs:520-543).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

def _read_avro(path, **kwargs):
    from .avro import read_avro

    return read_avro(path, **kwargs)


_EXT_READERS = {
    ".parquet": ray.data.read_parquet,
    ".csv": ray.data.read_csv,
    ".json": ray.data.read_json,
    ".jsonl": ray.data.read_json,
    ".avro": _read_avro,
}


def clean_read_parquet(path, **kwargs) -> ray.data.Dataset:
    """read_parquet with schema-level metadata dropped. Files written by
    pandas carry a schema-level 'pandas' metadata dict that makes pa.Schema
    UNHASHABLE — Ray then re-ships every block's schema through each read
    task and shuffle reduce instead of deduplicating ('Failed to hash the
    schemas' warning per task). Passing an explicitly stripped schema to the
    read keeps even the read-operator-internal blocks clean; a post-read
    strip map is the fallback for directory/list inputs."""
    if "schema" not in kwargs and isinstance(path, str) and os.path.isfile(path):
        import pyarrow.parquet as pq

        schema = pq.read_schema(path).remove_metadata()
        cols = kwargs.get("columns")
        if cols is not None:
            schema = pa.schema([schema.field(c) for c in cols])
        return ray.data.read_parquet(path, schema=schema, **kwargs)
    ds = ray.data.read_parquet(path, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def read_any(path: str, fmt: str | None = None, **kwargs) -> ray.data.Dataset:
    """Dispatch on extension like the reference's create_source
    (src/connectors/mod.rs:67-101). ``fmt`` forces the connector regardless
    of extension — the --source-type override (cli.rs:63, consumed at
    http.rs:33,93) for extensionless or mis-named URLs/paths."""
    ext = ("." + fmt.lstrip(".").lower()) if fmt else os.path.splitext(path)[1].lower()
    if ext not in _EXT_READERS:
        what = f"source type {fmt!r}" if fmt else f"source extension {ext!r}"
        raise ValueError(f"unsupported {what} for {path!r}")
    return _EXT_READERS[ext](path, **kwargs)


def write_any(ds: ray.data.Dataset, path: str, fmt: str | None = None) -> str:
    """Dispatch on extension/format like create_target
    (src/connectors/mod.rs:105-161). ``path`` is a directory (Ray writes a
    part-file per block — the resumable layout; the reference writes one
    monolithic file from a full in-RAM buffer)."""
    fmt = fmt or os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt in ("json", "jsonl"):
        ds.write_json(path)
    elif fmt == "avro":
        from .avro import write_avro

        write_avro(ds, path)
    else:
        raise ValueError(f"unsupported target format {fmt!r}")
    return path


def count_written_rows(
    path: str, fmt: str | None = None, only_files: set[str] | None = None
) -> int:
    """Row count of a just-written target from METADATA only — parquet
    footers, csv/jsonl line counts, avro block headers. Lets the CLI report
    TransferStats without re-executing the (lazy) pipeline a second time.

    ``only_files``: restrict to these basenames — in append mode the target
    directory also holds PREVIOUS runs' part files, which must not count
    toward this run's stats."""
    fmt = fmt or os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".")
            and (only_files is None or f in only_files)
        )
        if os.path.isdir(path)
        else [path]
    )
    total = 0
    if fmt == "parquet":
        import pyarrow.parquet as pq

        for f in files:
            total += pq.ParquetFile(f).metadata.num_rows
    elif fmt in ("csv", "json", "jsonl"):
        header = 1 if fmt == "csv" else 0
        for f in files:
            n = 0
            in_q = False  # CSV: newlines inside quoted fields are data,
            # not record separators — raw \n counting overcounts them.
            # Quote-parity scan; escaped "" flips twice (a net no-op).
            # (jsonl strings escape \n, so the plain count stays exact.)
            with open(f, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    if fmt == "csv" and b'"' in chunk:
                        parts = chunk.split(b'"')
                        for j, seg in enumerate(parts):
                            outside = (not in_q) if j % 2 == 0 else in_q
                            if outside:
                                n += seg.count(b"\n")
                        in_q ^= (len(parts) - 1) % 2 == 1
                    elif not in_q:
                        n += chunk.count(b"\n")
            total += max(0, n - header)
    elif fmt == "avro":
        from .avro import count_container_rows

        for f in files:
            total += count_container_rows(f)
    else:
        raise ValueError(f"unsupported target format {fmt!r}")
    return total


# date formats the sniffer recognizes — the full DateParser matrix of the
# reference (src/date_parser.rs:11-116), in ITS priority order (RFC3339 and
# datetime shapes first, then %m/%d before %d/%m for ambiguous numerics)
_DATE_FORMATS = [
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%m/%d/%Y %H:%M:%S",
    "%d/%m/%Y %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%m/%d/%Y %H:%M",
    "%d/%m/%Y %H:%M",
    "%Y-%m-%d %I:%M:%S %p",
    "%m/%d/%Y %I:%M:%S %p",
    "%d/%m/%Y %I:%M:%S %p",
    "%Y-%m-%d %I:%M %p",
    "%m/%d/%Y %I:%M %p",
    "%d/%m/%Y %I:%M %p",
    "%Y-%m-%d",
    "%m/%d/%Y",
    "%d/%m/%Y",
    "%m-%d-%Y",
    "%d-%m-%Y",
    "%Y/%m/%d",
    "%d.%m.%Y",
    "%Y.%m.%d",
    "%b %d, %Y",
    "%B %d, %Y",
    "%d %b %Y",
    "%d %B %Y",
]


_BOOL_WORDS = {"true": True, "false": False}

# admissibility bitmask kinds for the consensus vote (int is also float-
# admissible; the decision order below prefers the narrower type)
_KIND_INT = 1
_KIND_FLOAT = 2
_KIND_BOOL = 4
_KIND_DATE0 = 8  # << i per _DATE_FORMATS index


def _column_vote(ser: pd.Series) -> tuple[int, bool]:
    """(admissible-kinds bitmask, has any non-null value) for one batch's
    slice of a string column. Vectorized pandas .str ops throughout."""
    s = ser.replace("", np.nan)
    nonnull = s.dropna()
    if nonnull.empty:
        return (~0, False)  # no evidence: everything admissible
    mask = 0
    nonnull = nonnull.astype(str)
    as_num = pd.to_numeric(nonnull, errors="coerce")
    if as_num.notna().all():
        mask |= _KIND_FLOAT
        if nonnull.str.fullmatch(r"[+-]?\d+").all():
            mask |= _KIND_INT
    if nonnull.str.lower().isin(_BOOL_WORDS).all():
        mask |= _KIND_BOOL
    if not mask:  # only bother with date parses for non-numeric columns
        for i, fmt in enumerate(_DATE_FORMATS):
            parsed = pd.to_datetime(
                nonnull, format=fmt, errors="coerce", utc=fmt.endswith("%z")
            )
            if parsed.notna().all():
                mask |= _KIND_DATE0 << i
    return (mask, True)


class _TypeVote:
    """map_batches stage: one tiny row per block with each string column's
    admissibility bitmask. The driver ANDs the rows — whole-column consensus
    without materializing any data."""

    def __init__(self, columns: list[str]):
        self.columns = columns

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, list] = {}
        for name in self.columns:
            mask, has = _column_vote(df[name])
            row[f"{name}::mask"] = [np.int64(mask)]
            row[f"{name}::has"] = [bool(has)]
        return pd.DataFrame(row)


def sniff_column_types(ds: ray.data.Dataset, columns: list[str]) -> dict[str, str]:
    """Phase 1: distributed whole-column consensus over EVERY block.

    Returns {column: kind} where kind ∈ {int, float, bool, date:<fmt>}.
    Columns without a unanimous promotion stay out of the mapping (remain
    string). One extra streaming pass over the source; at scale this is the
    price of the documented column-consistent guarantee (a sample-based
    sniff would silently null out non-conforming values it never saw)."""
    votes = ds.map_batches(_TypeVote(columns), batch_format="pandas").take_all()
    mapping: dict[str, str] = {}
    for name in columns:
        mask = ~0
        has = False
        for v in votes:
            mask &= int(v[f"{name}::mask"])
            has = has or bool(v[f"{name}::has"])
        if not has or not mask:
            continue
        if mask & _KIND_INT:
            mapping[name] = "int"
        elif mask & _KIND_FLOAT:
            mapping[name] = "float"
        elif mask & _KIND_BOOL:
            mapping[name] = "bool"
        else:
            for i, fmt in enumerate(_DATE_FORMATS):
                if mask & (_KIND_DATE0 << i):
                    mapping[name] = f"date:{fmt}"
                    break
    return mapping


class ApplyTypes:
    """Phase 2: apply one fixed column→type mapping uniformly to every batch
    (cast-or-null safety net; consensus means errors cannot occur)."""

    def __init__(self, mapping: dict[str, str], column_order: list[str] | None = None):
        self.mapping = mapping
        self.column_order = column_order

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.column_order is not None:
            # normalize every block to ONE canonical column order — part
            # files are allowed to permute columns, but emitting blocks
            # with differing schemas breaks downstream writers/consumers
            df = df[self.column_order]
        out = {}
        for name in df.columns:
            ser = df[name]
            kind = self.mapping.get(name)
            if kind is None or (
                ser.dtype != object and not isinstance(ser.dtype, pd.StringDtype)
            ):
                out[name] = ser.replace("", np.nan) if ser.dtype == object else ser
                continue
            s = ser.replace("", np.nan)
            if kind == "int":
                out[name] = pd.to_numeric(s, errors="coerce").astype("Int64")
            elif kind == "float":
                out[name] = pd.to_numeric(s, errors="coerce").astype("float64")
            elif kind == "bool":
                out[name] = s.str.lower().map(_BOOL_WORDS).astype("boolean")
            else:  # date:<fmt>
                fmt = kind.split(":", 1)[1]
                parsed = pd.to_datetime(s, format=fmt, errors="coerce", utc=fmt.endswith("%z"))
                if fmt.endswith("%z"):
                    parsed = parsed.dt.tz_convert("UTC").dt.tz_localize(None)
                out[name] = parsed.astype("datetime64[us]")
        return pd.DataFrame(out)


def sniffed_read_csv(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """CSV read where every column arrives as string and the sniffer promotes
    types — mirrors the reference CSV source's dynamic typing end to end,
    strengthened to a true whole-column consensus (vote pass over all blocks,
    then one fixed mapping applied uniformly — per-batch sniffing could give
    different blocks different schemas).

    Accepts one path or a list (e.g. a directory of part files from a
    distributed CSV write) as ONE dataset — never union per-file datasets,
    which multiplies per-operator driver overhead."""
    import csv as _csv

    from pyarrow import csv as pacsv

    path_list = paths if isinstance(paths, list) else [paths]
    headers = []
    for p in path_list:
        with open(p) as f:
            headers.append(next(_csv.reader(f)))
    header = headers[0]
    # every part file must agree on the column SET (order may differ — the
    # reference's row model is order-preserving per file): pinning types from
    # only the first header would mis-type part files with extra/missing
    # columns silently
    for p, h in zip(path_list, headers):
        if sorted(h) != sorted(header):
            raise ValueError(
                f"CSV part files disagree on columns: {path_list[0]} has "
                f"{header} but {p} has {h}"
            )
    convert = pacsv.ConvertOptions(column_types={h: pa.string() for h in header})
    ds = ray.data.read_csv(paths, convert_options=convert, **kwargs)
    mapping = sniff_column_types(ds, header)
    return ds.map_batches(
        ApplyTypes(mapping, column_order=header), batch_format="pandas"
    )
