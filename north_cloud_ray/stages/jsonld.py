"""Schema.org JSON-LD block extraction and typed accessors.

Re-expresses the reference's jsonld utility package
(classifier/internal/classifier/jsonld/parser.go:22-280) as pure Python
kernels used by the tier-1 "schema_org" paths of the structured
extractors (recipe_extractor.go:83-110, job_extractor.go:88-115).

Semantics preserved exactly:
- extract_blocks: every ``<script type="application/ld+json">`` block is
  regex-located (dotall, case-insensitive), trimmed, and parsed as either
  a single JSON object or an array of objects; malformed blocks and
  arrays containing non-object elements are skipped wholesale (Go's
  ``json.Unmarshal`` into ``[]map[string]any`` fails if ANY element is
  not an object).
- find_by_type: first block whose ``@type`` is the exact string.
- parse_iso8601_duration: ``PT(nH)(nM)`` only; "PT" alone is invalid;
  returns total minutes or None.
- string_val / string_slice_val / nested_string_val / float_val /
  int_val: missing keys and wrong-typed values degrade to ""/None, a
  bare string promotes to a one-element list, non-string array elements
  are silently skipped, numeric strings parse ("42" -> 42, "4.5" -> 4.5,
  int_val rejects "4.5" like strconv.Atoi).

All functions are per-row pure kernels run inside map_batches — no
cross-row state, linear scale-out.
"""

from __future__ import annotations

import json
import re

_JSONLD_SCRIPT_RE = re.compile(
    r"<script[^>]+type=[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    re.S | re.I,
)

_DURATION_RE = re.compile(r"^PT(?:(\d+)H)?(?:(\d+)M)?$")

_MINUTES_PER_HOUR = 60


def extract_blocks(html: str) -> list[dict]:
    """All JSON-LD blocks in document order (parser.go:37-57)."""
    if not html:
        return []
    blocks: list[dict] = []
    for m in _JSONLD_SCRIPT_RE.finditer(html):
        content = m.group(1).strip()
        if not content:
            continue
        try:
            data = json.loads(content)
        except Exception:
            continue
        if isinstance(data, dict):
            blocks.append(data)
        elif isinstance(data, list) and all(isinstance(d, dict) for d in data):
            blocks.extend(data)
        # any other shape: skipped, mirroring the double-unmarshal failure
    return blocks


def find_by_type(blocks: list[dict] | None, type_name: str) -> dict | None:
    """First block whose @type equals type_name (parser.go:80-90)."""
    for block in blocks or ():
        t = block.get("@type")
        if isinstance(t, str) and t == type_name:
            return block
    return None


def parse_iso8601_duration(duration: str) -> int | None:
    """ISO 8601 PT#H#M duration -> total minutes (parser.go:96-131)."""
    m = _DURATION_RE.match(duration or "")
    if m is None:
        return None
    h, mins = m.group(1), m.group(2)
    if h is None and mins is None:
        return None
    return (int(h) if h else 0) * _MINUTES_PER_HOUR + (int(mins) if mins else 0)


def string_val(m: dict | None, key: str) -> str:
    """String field or "" (parser.go:135-146)."""
    if not m:
        return ""
    v = m.get(key)
    return v if isinstance(v, str) else ""


def string_slice_val(m: dict | None, key: str) -> list[str] | None:
    """String-list field; a bare string promotes to a one-element list;
    non-string elements are skipped (parser.go:150-181)."""
    if not m or key not in m:
        return None
    raw = m[key]
    if isinstance(raw, str):
        return [raw]
    if not isinstance(raw, list):
        return None
    return [e for e in raw if isinstance(e, str)]


def nested_string_val(m: dict | None, outer_key: str, inner_key: str) -> str:
    """String at m[outer][inner] or "" (parser.go:185-196)."""
    if not m:
        return ""
    outer = m.get(outer_key)
    if not isinstance(outer, dict):
        return ""
    return string_val(outer, inner_key)


def float_val(m: dict | None, key: str) -> float | None:
    """Float field; numeric strings parse; else None (parser.go:200-229)."""
    if not m or key not in m:
        return None
    raw = m[key]
    if isinstance(raw, bool):
        return None
    if isinstance(raw, (int, float)):
        return float(raw)
    if isinstance(raw, str):
        try:
            return float(raw)
        except ValueError:
            return None
    return None


def int_val(m: dict | None, key: str) -> int | None:
    """Int field; JSON numbers truncate, integer strings parse, "4.5"
    rejects like strconv.Atoi (parser.go:234-260)."""
    if not m or key not in m:
        return None
    raw = m[key]
    if isinstance(raw, bool):
        return None
    if isinstance(raw, (int, float)):
        return int(raw)
    if isinstance(raw, str):
        try:
            return int(raw)
        except ValueError:
            return None
    return None
