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
src/connectors/parquet.rs:456-464, json.rs:243-247). ``SniffTypes`` is a
vectorized ``map_batches`` stage that promotes whole string columns to
int64 / float64 / bool / timestamp when EVERY non-empty value parses —
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


def read_any(path: str, **kwargs) -> ray.data.Dataset:
    """Dispatch on extension like the reference's create_source
    (src/connectors/mod.rs:67-101)."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_READERS:
        raise ValueError(f"unsupported source extension {ext!r} for {path!r}")
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


# date formats the sniffer recognizes — the high-traffic subset of the
# reference's DateParser matrix (src/date_parser.rs:64-116)
_DATE_FORMATS = [
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%m/%d/%Y",
    "%d.%m.%Y",
    "%b %d, %Y",
]


def _try_dates(ser: pd.Series) -> pd.Series | None:
    nonnull = ser.dropna()
    if nonnull.empty:
        return None
    for fmt in _DATE_FORMATS:
        parsed = pd.to_datetime(ser, format=fmt, errors="coerce", utc=fmt.endswith("%z"))
        if parsed[ser.notna()].notna().all():
            if fmt.endswith("%z"):
                parsed = parsed.dt.tz_convert("UTC").dt.tz_localize(None)
            return parsed.astype("datetime64[us]")
    return None


class SniffTypes:
    """Vectorized column-type sniffer: int64 → float64 → bool → timestamp →
    string, whole-column consensus, empty string → null."""

    _BOOL = {"true": True, "false": False}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for name in df.columns:
            ser = df[name]
            if ser.dtype != object and not isinstance(ser.dtype, pd.StringDtype):
                out[name] = ser
                continue
            s = ser.replace("", np.nan)
            nonnull = s.dropna()
            if nonnull.empty:
                out[name] = s
                continue
            as_num = pd.to_numeric(nonnull, errors="coerce")
            if as_num.notna().all():
                full = pd.to_numeric(s, errors="coerce")
                if (as_num.astype("float64") % 1 == 0).all() and nonnull.str.fullmatch(
                    r"[+-]?\d+"
                ).all():
                    out[name] = full.astype("Int64")
                else:
                    out[name] = full.astype("float64")
                continue
            low = nonnull.str.lower()
            if low.isin(self._BOOL).all():
                out[name] = s.str.lower().map(self._BOOL).astype("boolean")
                continue
            dates = _try_dates(s)
            if dates is not None:
                out[name] = dates
                continue
            out[name] = s
        return pd.DataFrame(out)


def sniffed_read_csv(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """CSV read where every column arrives as string and the sniffer promotes
    types — mirrors the reference CSV source's dynamic typing end to end.

    Accepts one path or a list (e.g. a directory of part files from a
    distributed CSV write) as ONE dataset — never union per-file datasets,
    which multiplies per-operator driver overhead."""
    import csv as _csv

    from pyarrow import csv as pacsv

    first = paths[0] if isinstance(paths, list) else paths
    with open(first) as f:
        header = next(_csv.reader(f))
    convert = pacsv.ConvertOptions(column_types={h: pa.string() for h in header})
    ds = ray.data.read_csv(paths, convert_options=convert, **kwargs)
    return ds.map_batches(SniffTypes(), batch_format="pandas")
