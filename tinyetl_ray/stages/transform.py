"""Per-record transform engine — TinyETL's Lua hook, rebuilt vectorized.

The reference embeds Lua 5.4 and calls ``transform(row)`` per row
(/root/reference/src/transformer.rs:67-101, :171-279). Three modes with
distinct projection semantics (README:465-556):

- **inline** (`--transform "a=expr; b=expr"`): copy ALL input columns, then
  add/override each assignment (src/transformer.rs:171-221);
- **script**: sequential assignments, each also an output column, later lines
  see earlier results (src/transformer.rs:224-279);
- **function** (Lua file): arbitrary ``transform(row)``; ONLY returned keys
  are kept (projection), returning nil/{} drops the row (filter)
  (src/transformer.rs:340-356).

Here every mode is a ``map_batches`` stage over whole columns: expressions are
Python expressions evaluated ONCE PER BATCH against pandas Series (vectorized
arithmetic/comparison/string ops), not per row. The function mode takes a
user callable ``fn(batch: pd.DataFrame) -> pd.DataFrame``.

Security note: expressions are compiled with an empty ``__builtins__`` and a
whitelisted helper namespace — same trust model as the reference's Lua
sandbox (user-authored job config, not untrusted input).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import numpy as np
import pandas as pd

# Lua → helper mapping for users porting reference transforms
# (README:551-556 documents the supported Lua surface; Lua patterns like
# %d translate to regex \d):
#   string.lower/upper(s)        → lower(col) / upper(col)
#   string.sub(s, i, j)          → substr(col, i-1, j)        (0-based here)
#   string.gsub(s, pat, rep)     → replace(col, pat, rep)     (regex pat)
#   string.match(s, '(%d%d%d%d)')→ extract(col, r'(\d{4})')   (capture group)
#   string.find(s, pat)          → find(col, pat)             (0-based, -1=absent)
#   s1 .. s2                     → concat(a, b) or a + b on string cols
#   tonumber(s)                  → tonumber(col)               (nil→NaN coerce)
#   tostring(x)                  → tostring(col)
#   math.floor/ceil/abs          → floor/ceil/abs
#   cond and a or b              → iif(cond, a, b)
_HELPERS: dict[str, object] = {
    # string helpers (Lua string.* analogs, vectorized via pandas .str)
    "upper": lambda s: s.str.upper(),
    "lower": lambda s: s.str.lower(),
    "strip": lambda s: s.str.strip(),
    "length": lambda s: s.str.len(),
    "substr": lambda s, a, b=None: s.str.slice(a, b),
    "replace": lambda s, pat, rep: s.str.replace(pat, rep, regex=True),
    "match": lambda s, pat: s.str.match(pat),
    "extract": lambda s, pat: s.str.extract(pat, expand=False),
    "find": lambda s, sub: s.str.find(sub),
    "contains": lambda s, pat: s.str.contains(pat, regex=True, na=False),
    "startswith": lambda s, pre: s.str.startswith(pre, na=False),
    "endswith": lambda s, suf: s.str.endswith(suf, na=False),
    "split_part": lambda s, sep, i: s.str.split(sep).str[i],
    "lpad": lambda s, n, c=" ": s.str.pad(n, side="left", fillchar=c),
    "concat": lambda *parts: _concat(parts),
    "coalesce": lambda *xs: _coalesce(xs),
    "iif": lambda cond, a, b: _iif(cond, a, b),
    # type coercion (tonumber returns NaN where Lua returns nil)
    "tonumber": lambda s: pd.to_numeric(s, errors="coerce"),
    "tostring": lambda s: s.astype(str) if isinstance(s, pd.Series) else str(s),
    # math (numpy is already vectorized)
    "abs": np.abs,
    "floor": np.floor,
    "ceil": np.ceil,
    "round": lambda s, n=0: np.round(s, n),
    "sqrt": np.sqrt,
    "log": np.log,
    "exp": np.exp,
    "pow": np.power,
    "mod": np.mod,
    "min2": np.minimum,
    "max2": np.maximum,
    "clip": lambda s, lo, hi: np.clip(s, lo, hi),
}


def _concat(parts):
    out = None
    for p in parts:
        s = p.astype(str) if isinstance(p, pd.Series) else str(p)
        out = s if out is None else out + s
    return out


def _coalesce(xs):
    # broadcast a scalar first argument over the batch index — a bare
    # pd.Series(scalar) is length-1 and would index-align to row 0 only,
    # silently NaN-ing every other row on assignment
    idx = next((x.index for x in xs if isinstance(x, pd.Series)), None)
    out = xs[0]
    if not isinstance(out, pd.Series):
        if idx is None:  # pure-scalar call: first non-null wins
            for x in xs:
                if x is not None and x == x:
                    return x
            return None
        out = pd.Series(out, index=idx)
    for x in xs[1:]:
        out = out.where(out.notna(), x)
    return out


def _iif(cond, a, b):
    if isinstance(cond, pd.Series):
        return pd.Series(np.where(cond.fillna(False), a, b))
    return a if cond else b


_ASSIGN_RE = re.compile(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+?)\s*$")


def _split_statements(spec: str) -> list[str]:
    """Split on ``;`` / newline OUTSIDE string literals — expressions like
    ``replace(name, ';', ',')`` legitimately contain the delimiters."""
    stmts: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    i = 0
    while i < len(spec):
        c = spec[i]
        if quote:
            buf.append(c)
            if c == "\\" and i + 1 < len(spec):
                buf.append(spec[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
            buf.append(c)
        elif c in ";\n":
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    stmts.append("".join(buf))
    return stmts


def parse_assignments(spec: str) -> list[tuple[str, str]]:
    """Parse ``"a = expr; b = expr"`` / newline-separated assignment lists
    (the reference's inline/script grammar, src/transformer.rs:176-189)."""
    out = []
    for stmt in _split_statements(spec):
        if not stmt.strip():
            continue
        m = _ASSIGN_RE.match(stmt)
        if not m:
            raise ValueError(f"bad transform assignment: {stmt!r}")
        out.append((m.group(1), m.group(2)))
    return out


class ExpressionTransform:
    """``map_batches(ExpressionTransform(...), batch_format="pandas")``.

    mode="inline": output = all input columns + assignments (add/override).
    mode="script": output = assignments ONLY appear as columns as in the
        reference's script codegen (every assignment is an output column,
        and input columns are carried too — src/transformer.rs:231-260 keeps
        ``result`` seeded from the row copy).
    Assignments are evaluated in order; later expressions see earlier
    results. Expressions are compiled once in __init__ (actor-friendly).
    """

    def __init__(self, spec: str | list[tuple[str, str]], filter_expr: str | None = None):
        pairs = parse_assignments(spec) if isinstance(spec, str) else spec
        self.assigns = [(n, compile(e, f"<transform:{n}>", "eval")) for n, e in pairs]
        self.filter_code = (
            compile(filter_expr, "<transform:filter>", "eval") if filter_expr else None
        )

    def _env(self, df: pd.DataFrame) -> dict:
        env = dict(_HELPERS)
        env["__builtins__"] = {}
        for c in df.columns:
            env[c] = df[c]
        return env

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        env = self._env(df)
        for name, code in self.assigns:
            val = eval(code, env)  # noqa: S307 — sandboxed, job-author supplied
            df[name] = val
            env[name] = df[name]
        if self.filter_code is not None:
            mask = eval(self.filter_code, env)  # noqa: S307
            if isinstance(mask, pd.Series):
                df = df[mask.fillna(False)]
            elif not mask:
                df = df.iloc[0:0]
        return df


class FunctionTransform:
    """Lua-file-mode parity: arbitrary user callable with PROJECTION semantics
    — only the columns the callable returns survive; returning an empty
    frame drops the batch's rows (filter). src/transformer.rs:67-101."""

    def __init__(self, fn: Callable[[pd.DataFrame], pd.DataFrame]):
        self.fn = fn

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return self.fn(df)


def project(columns: list[str]) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Keep-only-these-columns helper (reference: returned-keys projection)."""

    def _p(df: pd.DataFrame) -> pd.DataFrame:
        return df[columns]

    return _p
