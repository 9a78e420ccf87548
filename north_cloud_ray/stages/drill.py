"""Drill-result extraction for the mining sidecar — faithful
re-expression of the reference's regex extractor and normalizer
(classifier/internal/classifier/drill_extractor.go:32-305,
drill_normalizer.go:11-122): hole-ID patterns, intercept@grade,
from-to intervals with grade lookahead, "including" sub-intervals,
nearest-preceding-hole-ID attribution, completeness confidence, and
commodity/unit/hole-ID normalization with string-keyed dedup.

Pure per-row kernels (compiled regexes at module level) run inside
map_batches; a drill result row is
{hole_id, commodity, intercept_m, grade, unit}.
"""

from __future__ import annotations

import math
import re

CONFIDENCE_COMPLETE = "complete"
CONFIDENCE_PARTIAL = "partial"
CONFIDENCE_NONE = "none"

_RE_HOLE_ID = re.compile(
    r"(?i)\b((?:DDH|RC|DH|BH|HOLE|HQ|NQ|PQ)[-\s]?\d{2,4}[-\s]?\d{1,4}[A-Z]?)\b")
_COMMODITIES = (r"(Au|Ag|Cu|Ni|Zn|Li|Pb|U3O8|CuEq|AuEq"
                r"|gold|silver|copper|nickel|zinc|lithium|uranium)?")
_RE_INTERCEPT_GRADE = re.compile(
    r"(?i)(\d+\.?\d*)\s*(?:m|metres?|meters?)"
    r"\s*(?:@|grading|of|averaging)\s*(\d+\.?\d*)"
    r"\s*(g/t|gpt|%|ppm|oz/t)\s*" + _COMMODITIES)
_RE_FROM_TO = re.compile(
    r"(?i)(?:from\s+)(\d+\.?\d*)\s*m?\s*(?:to|-)\s*(\d+\.?\d*)\s*m")
_RE_INCLUDING = re.compile(
    r"(?i)(?:including|incl\.?)\s+(\d+\.?\d*)\s*(?:m|metres?|meters?)"
    r"\s*(?:@|of|grading)\s*(\d+\.?\d*)"
    r"\s*(g/t|gpt|%|ppm|oz/t)\s*" + _COMMODITIES)
_RE_SIMPLE_GRADE = re.compile(
    r"(?i)(?:grading|@|of|averaging)\s*(\d+\.?\d*)\s*(g/t|gpt|%|ppm|oz/t)"
    r"\s*(Au|Ag|Cu|Ni|Zn|Li|Pb|U3O8)?")

_LOOKAHEAD_CHARS = 200

COMMODITY_MAP = {
    "au": "gold", "ag": "silver", "cu": "copper", "ni": "nickel",
    "zn": "zinc", "li": "lithium", "pb": "lead", "u3o8": "uranium",
    "cueq": "copper", "aueq": "gold", "co": "cobalt", "sn": "tin",
    "pt": "platinum", "pd": "palladium", "ree": "rare-earths",
    "fe": "iron-ore",
    "gold": "gold", "silver": "silver", "copper": "copper",
    "nickel": "nickel", "zinc": "zinc", "lithium": "lithium",
    "lead": "lead", "uranium": "uranium", "cobalt": "cobalt",
    "tin": "tin", "platinum": "platinum", "palladium": "palladium",
    "rare-earths": "rare-earths", "iron-ore": "iron-ore",
}

UNIT_MAP = {
    "g/t": "g/t", "gpt": "g/t", "g per tonne": "g/t",
    "grams per tonne": "g/t", "grams per ton": "g/t",
    "%": "%", "percent": "%",
    "ppm": "ppm", "parts per million": "ppm",
    "oz/t": "oz/t", "ounces per ton": "oz/t",
}


def _fmt(x: float, prec: int) -> str:
    return f"{x:.{prec}f}"


def _is_duplicate(results: list[dict], hole_id: str,
                  intercept: float, grade: float) -> bool:
    """String-keyed float comparison (drill_extractor.go
    isDuplicateResult); hole_id "" matches any."""
    i_str, g_str = _fmt(intercept, 2), _fmt(grade, 4)
    for r in results:
        if _fmt(r["intercept_m"], 2) == i_str and _fmt(r["grade"], 4) == g_str:
            if hole_id == "" or r["hole_id"] == hole_id:
                return True
    return False


def _normalize_unit_raw(unit: str) -> str:
    key = (unit or "").strip().lower()
    if key in ("gpt", "g per tonne", "grams per tonne"):
        return "g/t"
    return key


def extract_hole_ids(body: str) -> list[str]:
    return [m.group(1).upper().replace(" ", "-")
            for m in _RE_HOLE_ID.finditer(body)]


def _nearest_hole_id(body: str, pos: int, hole_ids: list[str]) -> str:
    """Closest preceding hole-ID occurrence (findNearestHoleID)."""
    if not hole_ids:
        return ""
    best_id, best_dist = "", len(body)
    for i, m in enumerate(_RE_HOLE_ID.finditer(body)):
        dist = pos - m.start()
        if 0 <= dist < best_dist:
            best_dist = dist
            if i < len(hole_ids):
                best_id = hole_ids[i]
    return best_id


def extract_drill_regex(body: str) -> tuple[list[dict], str]:
    """(results, confidence) per drill_extractor.go extractDrillRegex:
    intercept@grade, from-to (with 200-char grade lookahead), and
    "including" sub-interval strategies in order."""
    body = body or ""
    hole_ids = extract_hole_ids(body)
    results: list[dict] = []

    for m in _RE_INTERCEPT_GRADE.finditer(body):
        results.append({
            "hole_id": _nearest_hole_id(body, m.start(), hole_ids),
            "commodity": m.group(4) or "",
            "intercept_m": float(m.group(1)),
            "grade": float(m.group(2)),
            "unit": _normalize_unit_raw(m.group(3)),
        })

    for m in _RE_FROM_TO.finditer(body):
        frm, to = float(m.group(1)), float(m.group(2))
        intercept = abs(to - frm)
        after = body[m.end():m.end() + _LOOKAHEAD_CHARS]
        gm = _RE_INTERCEPT_GRADE.search(after) or _RE_SIMPLE_GRADE.search(after)
        if gm is None:
            continue
        # the reference indexes gradeMatch[1..3] regardless of which
        # pattern matched (parseFromToMatch) — preserved verbatim,
        # including the intercept-grade-lookahead field shift
        groups = gm.groups()
        grade = float(groups[0])
        unit = _normalize_unit_raw(groups[1] or "")
        commodity = (groups[2] or "") if len(groups) >= 3 else ""
        hole_id = _nearest_hole_id(body, m.start(), hole_ids)
        if _is_duplicate(results, hole_id, intercept, grade):
            continue
        # math.Round (half away from zero) of the interval width
        results.append({
            "hole_id": hole_id, "commodity": commodity,
            "intercept_m": math.floor(intercept * 100 + 0.5) / 100,
            "grade": grade, "unit": unit,
        })

    for m in _RE_INCLUDING.finditer(body):
        intercept, grade = float(m.group(1)), float(m.group(2))
        if _is_duplicate(results, "", intercept, grade):
            continue
        results.append({
            "hole_id": "",  # sub-intervals rarely restate the hole ID
            "commodity": m.group(4) or "",
            "intercept_m": intercept, "grade": grade,
            "unit": _normalize_unit_raw(m.group(3)),
        })

    has_complete = any(r["hole_id"] and r["intercept_m"] > 0
                       and r["grade"] > 0 for r in results)
    if has_complete:
        return results, CONFIDENCE_COMPLETE
    if hole_ids or results:
        return results, CONFIDENCE_PARTIAL
    return [], CONFIDENCE_NONE


def normalize_commodity(raw: str) -> str:
    if not raw:
        return ""
    key = raw.strip().lower()
    return COMMODITY_MAP.get(key, key)


def normalize_unit(raw: str) -> str:
    key = (raw or "").strip().lower()
    return UNIT_MAP.get(key, key)


def normalize_hole_id(raw: str) -> str:
    return (raw or "").strip().upper().replace(" ", "-")


def _dedup_num(x: float, prec: int) -> str:
    return _fmt(x, prec).rstrip("0").rstrip(".")


def normalize_drill_results(results: list[dict]) -> list[dict]:
    """Normalize fields, drop empty rows, dedupe by
    hole_id|intercept|grade (drill_normalizer.go:88-122)."""
    seen: set[str] = set()
    out: list[dict] = []
    for r in results:
        r = dict(r)
        r["hole_id"] = normalize_hole_id(r["hole_id"])
        r["commodity"] = normalize_commodity(r["commodity"])
        r["unit"] = normalize_unit(r["unit"])
        if not r["hole_id"] and r["intercept_m"] == 0 and r["grade"] == 0:
            continue
        key = "|".join([r["hole_id"], _dedup_num(r["intercept_m"], 2),
                        _dedup_num(r["grade"], 4)])
        if key in seen:
            continue
        seen.add(key)
        out.append(r)
    return out
