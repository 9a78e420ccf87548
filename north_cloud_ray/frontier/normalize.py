"""URL normalization / hashing kernels — the dedup + ordering foundation.

Bit-exact re-implementation of the reference semantics
(crawler/internal/frontier/normalize.go:49-184):

- lowercase scheme + host, force https
- strip default ports (80 for the original http scheme, 443 for https)
- resolve path dot-segments, strip trailing slashes (root stays "/")
- drop fragment
- drop the 10 tracking params (utm_*, fbclid, gclid, gclsrc, dclid, msclkid)
- sort remaining query keys alphabetically, values keep appearance order,
  re-encoded with QueryEscape semantics (space -> '+')

Vectorization strategy: most URLs in a steady-state crawl are already in
normalized form (we emit normalized URLs into the frontier), so the batch
kernel first runs a cheap vectorized "already normalized" regex check with
``pyarrow.compute`` and only applies the Python slow path to the rows that
fail it. SHA-256 hashing is a tight ``hashlib`` loop per batch (no
vectorized SHA exists in pyarrow); it is ~1 us/row and amortized under the
map_batches stage.
"""

from __future__ import annotations

import hashlib
import posixpath
import re
from urllib.parse import quote, quote_plus, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# normalize.go:19-30
TRACKING_PARAMS = frozenset(
    {
        "utm_source",
        "utm_medium",
        "utm_campaign",
        "utm_term",
        "utm_content",
        "fbclid",
        "gclid",
        "gclsrc",
        "dclid",
        "msclkid",
    }
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Go's url.QueryEscape leaves [A-Za-z0-9-._~] unescaped and turns space
# into '+': identical to urllib.parse.quote_plus with safe="".
_query_escape = quote_plus

# Path escaping for reassembly. Go's URL.String() uses EscapedPath() which
# keeps these characters literal inside a path.
_PATH_SAFE = "/$&+,:;=@!'()*%~-._"


class NormalizeError(ValueError):
    """Raised for empty input / missing scheme or host (normalize.go:38-42)."""


def _clean_path(p: str) -> str:
    """path.Clean + strip trailing '/' keeping root (normalize.go:176-184)."""
    if p == "" or p == "/":
        return "/"
    cleaned = posixpath.normpath(p)
    # posixpath.normpath preserves a leading '//' (POSIX); Go's path.Clean
    # collapses it.
    if cleaned.startswith("//"):
        cleaned = cleaned[1:]
    if cleaned == ".":
        cleaned = ""
    out = cleaned.rstrip("/")
    # Go path.Clean("/..") == "/"; normpath agrees. Go keeps absolute paths
    # absolute; relative inputs cannot occur here (host-rooted).
    return out


def _parse_query_pairs(raw_query: str) -> list[tuple[str, str]]:
    """Go url.ParseQuery: split on '&' only, '=' optional (empty value)."""
    pairs: list[tuple[str, str]] = []
    for part in raw_query.split("&"):
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
        else:
            k, v = part, ""
        from urllib.parse import unquote_plus

        pairs.append((unquote_plus(k), unquote_plus(v)))
    return pairs


def _build_clean_query(raw_query: str) -> str:
    """Strip tracking params, sort keys, re-encode (normalize.go:137-172)."""
    if not raw_query:
        return ""
    values: dict[str, list[str]] = {}
    for k, v in _parse_query_pairs(raw_query):
        values.setdefault(k, []).append(v)
    keys = sorted(k for k in values if k not in TRACKING_PARAMS)
    if not keys:
        return ""
    out_parts = []
    for k in keys:
        for v in values[k]:
            out_parts.append(f"{_query_escape(k)}={_query_escape(v)}")
    return "&".join(out_parts)


def normalize_url(raw_url: str) -> str:
    """Scalar normalization; raises NormalizeError like the Go version errors."""
    if not raw_url:
        raise NormalizeError("normalize url: empty input")
    try:
        parts = urlsplit(raw_url)
    except ValueError as e:  # pragma: no cover - malformed ipv6 etc.
        raise NormalizeError(f"normalize url: {e}") from e
    if not parts.scheme or not parts.netloc:
        raise NormalizeError("normalize url: missing scheme or host")

    original_scheme = parts.scheme.lower()
    hostname = (parts.hostname or "").lower()
    port = None
    try:
        port = parts.port  # int or None
    except ValueError:
        # non-numeric port: keep raw netloc port text
        netloc = parts.netloc.rsplit("@", 1)[-1]
        if ":" in netloc:
            port_s = netloc.rsplit(":", 1)[1]
        else:
            port_s = ""
        host = hostname + (":" + port_s if port_s else "")
        return _assemble(host, parts.path, parts.query)

    if port is not None:
        port_s = str(port)
        # strip when default for the original scheme or for https
        # (normalize.go:116-132)
        if port_s in (_DEFAULT_PORTS.get(original_scheme), _DEFAULT_PORTS["https"]):
            host = hostname
        else:
            host = f"{hostname}:{port_s}"
    else:
        host = hostname
    return _assemble(host, parts.path, parts.query)


def _assemble(host: str, path: str, query: str) -> str:
    path = _clean_path(path)
    q = _build_clean_query(query)
    url = f"https://{host}{quote(path, safe=_PATH_SAFE)}"
    if q:
        url += "?" + q
    return url


def url_hash(raw_url: str) -> str:
    """SHA-256 hex of the normalized URL — 64 chars (normalize.go:75-84)."""
    return hashlib.sha256(normalize_url(raw_url).encode()).hexdigest()


def extract_host(raw_url: str) -> str:
    """Lowercased hostname without port (normalize.go:87-102)."""
    if not raw_url:
        raise NormalizeError("extract host: empty input")
    try:
        parts = urlsplit(raw_url)
    except ValueError as e:  # pragma: no cover
        raise NormalizeError(f"extract host: {e}") from e
    if not parts.scheme or not parts.netloc:
        raise NormalizeError("extract host: missing scheme or host")
    return (parts.hostname or "").lower()


def host_hash64(host: str) -> int:
    """Stable 64-bit hash of a host (shard routing key). Derived from
    SHA-256 so it is stable across processes/nodes — never use builtin
    ``hash()`` (PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.sha256(host.encode()).digest()[:8], "big") >> 1


# --- binary / non-content URL predicate (fetcher/worker.go:62-77,509-526) ---

_BINARY_EXTENSIONS = (
    ".pdf", ".xml", ".json", ".css", ".js",
    ".png", ".jpg", ".jpeg", ".gif", ".svg", ".ico", ".webp",
    ".woff", ".woff2", ".ttf", ".eot",
    ".zip", ".gz", ".tar", ".rar",
    ".mp3", ".mp4", ".wav", ".ogg", ".avi", ".mov",
    ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
)
_BINARY_PATH_SUBSTRINGS = ("downloadmp3", "download.php", "downloadfile")

_BINARY_RE = re.compile(
    r"(?:" + "|".join(re.escape(e) for e in _BINARY_EXTENSIONS) + r")$"
    r"|" + "|".join(re.escape(s) for s in _BINARY_PATH_SUBSTRINGS)
)


def is_binary_url(raw_url: str) -> bool:
    try:
        path = urlsplit(raw_url).path.lower()
    except ValueError:
        return False
    return bool(_BINARY_RE.search(path))


def is_binary_url_mask(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized binary-URL predicate over the *path* component."""
    paths = pc.utf8_lower(
        pc.replace_substring_regex(urls, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    )
    paths = pc.replace_substring_regex(paths, r"[?#].*$", "")
    ext_pat = r"(?:" + "|".join(re.escape(e) for e in _BINARY_EXTENSIONS) + r")$"
    sub_pat = "|".join(re.escape(s) for s in _BINARY_PATH_SUBSTRINGS)
    m1 = pc.match_substring_regex(paths, ext_pat)
    m2 = pc.match_substring_regex(paths, sub_pat)
    return pc.or_(m1, m2)


# --- vectorized batch kernels ---

# A URL that matches this is already in normalized form: https scheme,
# lowercase host, no port, no query/fragment, simple path segments with no
# '.'/'..' segments and no trailing slash (or exactly root '/').
_ALREADY_NORMALIZED_RE = (
    r"^https://[a-z0-9-]+(\.[a-z0-9-]+)*"
    r"(/|(/(\.?[a-zA-Z0-9_~%,+-]+)+(\.[a-zA-Z0-9_~%,+-]+)*)+)$"
)
# reject dot-segments conservatively
_DOT_SEGMENT_RE = r"/\.{1,2}(/|$)"


def normalize_url_column(urls: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Vectorized NormalizeURL over a string column.

    Returns (normalized, valid_mask). Invalid URLs (missing scheme/host)
    get normalized='' and valid=False — callers filter them out, mirroring
    the Go error path.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    fast = pc.and_(
        pc.match_substring_regex(urls, _ALREADY_NORMALIZED_RE),
        pc.invert(pc.match_substring_regex(urls, _DOT_SEGMENT_RE)),
    )
    fast_np = fast.to_numpy(zero_copy_only=False)
    py = urls.to_pylist()
    out = np.empty(len(py), dtype=object)
    valid = np.ones(len(py), dtype=bool)
    for i, u in enumerate(py):
        if u is not None and fast_np[i]:
            out[i] = u
            continue
        try:
            out[i] = normalize_url(u or "")
        except NormalizeError:
            out[i] = ""
            valid[i] = False
    return pa.array(out, type=pa.string()), pa.array(valid)


def sha256_hex_column(strings: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SHA-256 hex over a string column (tight hashlib loop)."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    sha = hashlib.sha256
    return pa.array(
        [sha(s.encode()).hexdigest() if s is not None else None for s in strings.to_pylist()],
        type=pa.string(),
    )


def extract_host_column(normalized_urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Hostname (no port) from already-normalized URLs — pure pyarrow."""
    hosts = pc.replace_substring_regex(normalized_urls, r"^https://", "")
    hosts = pc.replace_substring_regex(hosts, r"[/:?#].*$", "")
    return pc.utf8_lower(hosts)


def host_hash_column(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """host_hash64 over a host column with a per-batch memo (few distinct
    hosts per batch in practice)."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    memo: dict[str, int] = {}
    out = np.zeros(len(hosts), dtype=np.uint64)
    for i, h in enumerate(hosts.to_pylist()):
        if h is None:
            continue
        v = memo.get(h)
        if v is None:
            v = memo[h] = host_hash64(h)
        out[i] = v
    return pa.array(out, type=pa.uint64())
