"""Connection-string processing: secrets injection, `#table` fragments,
http(s) download-to-temp.

Reference semantics:
- ``{secret_id}`` placeholders in connection URIs are replaced from
  ``TINYETL_SECRET_{ID}`` environment variables; a missing secret is an
  error (/root/reference/src/secrets.rs:29-88).
- ``path#fragment`` carries the table name; fallback chain table-name →
  file stem → "data" (/root/reference/src/transfer.rs:370-381,
  src/protocols/file.rs:26-77).
- ``file://`` URLs strip to local paths.
- ``http(s)://`` downloads to a temp file whose suffix is taken from the
  URL path, honoring ``header.*`` / ``auth.basic.username`` +
  ``auth.basic.password`` / ``auth.bearer`` options, then the extension
  dispatch takes over — mirroring src/protocols/http.rs:30-160 (tested
  against a loopback server, as the reference does with
  test_env/http-server).
- ``ssh://user@host[:port]/path`` downloads via the system ``scp`` client
  to a temp file (src/protocols/ssh.rs:28-96 — same command shape, relaxed
  host-key checks, extension-preserving temp file); tested against a mock
  scp on PATH since the sandbox has no sshd.
- the reference's snowflake:// MOCK (snowflake.rs:226-294 fabricates data)
  is deliberately not reproduced — we refuse instead.
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


def http_download(url: str, options: dict[str, str] | None = None) -> str:
    """Download ``url`` to a temp file and return its path.

    Option names mirror the reference (src/protocols/http.rs:40-66):
    ``header.<Name>=<value>`` custom headers, ``auth.basic.username`` +
    ``auth.basic.password``, ``auth.bearer``. Non-2xx raises. The temp file
    keeps the URL's extension so connector dispatch works unchanged."""
    import base64
    import tempfile
    import urllib.error
    import urllib.request

    options = options or {}
    req = urllib.request.Request(url)
    for k, v in options.items():
        if k.startswith("header."):
            req.add_header(k[len("header.") :], v)
    user = options.get("auth.basic.username")
    pw = options.get("auth.basic.password")
    if user is not None and pw is not None:
        cred = base64.b64encode(f"{user}:{pw}".encode()).decode()
        req.add_header("Authorization", f"Basic {cred}")
    if "auth.bearer" in options:
        req.add_header("Authorization", f"Bearer {options['auth.bearer']}")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            status = getattr(resp, "status", 200)
            if not (200 <= status < 300):
                raise ConnectionError(f"HTTP request failed with status {status}: {url}")
            content = resp.read()
    except urllib.error.HTTPError as e:
        raise ConnectionError(f"HTTP request failed with status {e.code}: {url}") from e
    except urllib.error.URLError as e:
        raise ConnectionError(f"Failed to fetch URL {url}: {e.reason}") from e
    name = urlparse(url).path.rsplit("/", 1)[-1]
    ext = ""
    if "." in name:
        cand = name.rsplit(".", 1)[-1].lower()
        if cand and len(cand) <= 10:
            ext = "." + cand
    fd, tmp = tempfile.mkstemp(suffix=ext, prefix="tinyetl-http-")
    with os.fdopen(fd, "wb") as f:
        f.write(content)
    return tmp


def ssh_download(url: str) -> str:
    """Download ``ssh://user@host[:port]/path`` to a temp file via the
    system ``scp`` client and return the local path — the reference's
    transport exactly (src/protocols/ssh.rs:28-96: scp -P port, host-key
    checks relaxed, temp file keeps the remote extension). Requires a
    username and a non-empty remote path, like the reference."""
    import subprocess
    import tempfile

    parsed = urlparse(url)
    if not parsed.hostname:
        raise ValueError("SSH URL must specify a host")
    if not parsed.username:
        raise ValueError("SSH URL must specify a username (ssh://user@host/path)")
    # a leading '-' would make scp parse the source operand as an OPTION
    # (the CVE-2017-1000117 argument-injection pattern: a crafted
    # ssh://-oProxyCommand=...@host/ URI executes attacker commands);
    # reject it AND terminate option parsing with '--' below
    if parsed.username.startswith("-") or parsed.hostname.startswith("-"):
        raise ValueError("SSH username/host must not start with '-'")
    remote_path = parsed.path
    if remote_path in ("", "/"):
        raise ValueError("SSH URL must specify a file path")
    ext = os.path.splitext(remote_path)[1]
    fd, tmp = tempfile.mkstemp(suffix=ext, prefix="tinyetl-ssh-")
    os.close(fd)
    cmd = [
        "scp",
        "-P", str(parsed.port or 22),
        "-o", "StrictHostKeyChecking=no",
        "-o", "UserKnownHostsFile=/dev/null",
        "-q",
        "--",
        f"{parsed.username}@{parsed.hostname}:{remote_path}",
        tmp,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except FileNotFoundError as err:
        os.remove(tmp)
        raise ConnectionError(
            "scp client not found — ssh:// transport needs an ssh client installed"
        ) from err
    except subprocess.TimeoutExpired as err:
        os.remove(tmp)
        raise ConnectionError(f"SCP download timed out after 120s: {url}") from err
    if res.returncode != 0:
        os.remove(tmp)
        raise ConnectionError(
            f"SCP download failed ({res.returncode}): {res.stderr.strip()}"
        )
    return tmp


def parse_target(uri: str, options: dict[str, str] | None = None) -> tuple[str, str]:
    """URI → (local_path, table_name). http(s)/ssh URIs download to temp."""
    uri = inject_secrets(uri)
    frag = None
    if "#" in uri:
        uri, frag = uri.split("#", 1)
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else uri
    elif parsed.scheme in ("http", "https"):
        path = http_download(uri, options)
        # table name falls back to the URL's file stem, not the temp name
        frag = frag or os.path.splitext(parsed.path.rsplit("/", 1)[-1])[0] or None
    elif parsed.scheme == "ssh":
        path = ssh_download(uri)
        frag = frag or os.path.splitext(parsed.path.rsplit("/", 1)[-1])[0] or None
    elif parsed.scheme == "snowflake":
        raise NotImplementedError(
            "snowflake:// is deliberately not reproduced: the reference's "
            "snowflake connector is a data-fabricating mock "
            "(snowflake.rs:226-294); refusing is more honest than inventing "
            "rows"
        )
    else:
        raise ValueError(f"unsupported scheme {parsed.scheme!r}")
    table = frag or os.path.splitext(os.path.basename(path))[0] or "data"
    return path, table


def resolve_source(uri: str, options: dict[str, str] | None = None) -> str:
    """URI → local readable path (downloads http(s), strips file://)."""
    return parse_target(uri, options)[0]
