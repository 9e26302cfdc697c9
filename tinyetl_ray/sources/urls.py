"""Connection-string processing: secrets injection + `#table` fragments.

Reference semantics:
- ``{secret_id}`` placeholders in connection URIs are replaced from
  ``TINYETL_SECRET_{ID}`` environment variables; a missing secret is an
  error (/root/reference/src/secrets.rs:29-88).
- ``path#fragment`` carries the table name; fallback chain table-name →
  file stem → "data" (/root/reference/src/transfer.rs:370-381,
  src/protocols/file.rs:26-77).
- ``file://`` URLs strip to local paths; http/ssh protocols are
  download-to-temp in the reference (src/protocols/http.rs, ssh.rs) — no
  network exists in this environment, so those schemes raise with a clear
  message instead of silently mocking (the reference's snowflake:// mock
  fabricates data, snowflake.rs:226-294 — we refuse instead).
"""

from __future__ import annotations

import os
import re
from urllib.parse import urlparse

_SECRET_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")
SECRET_PREFIX = "TINYETL_SECRET_"


def inject_secrets(uri: str, env: dict | None = None) -> str:
    env = env if env is not None else os.environ

    def sub(m: re.Match) -> str:
        key = SECRET_PREFIX + m.group(1).upper()
        if key not in env:
            raise KeyError(f"secret {m.group(1)!r} requires env var {key}")
        return str(env[key])

    return _SECRET_RE.sub(sub, uri)


def parse_target(uri: str) -> tuple[str, str]:
    """URI → (local_path, table_name)."""
    uri = inject_secrets(uri)
    frag = None
    if "#" in uri:
        uri, frag = uri.split("#", 1)
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else uri
    elif parsed.scheme in ("http", "https", "ssh", "snowflake"):
        raise NotImplementedError(
            f"{parsed.scheme}:// transport needs network access, unavailable "
            "in this environment (reference downloads to a temp file)"
        )
    else:
        raise ValueError(f"unsupported scheme {parsed.scheme!r}")
    table = frag or os.path.splitext(os.path.basename(path))[0] or "data"
    return path, table
