"""Drill-result extraction parity vectors, ported from the reference's
classifier/internal/classifier/drill_extractor_test.go and
drill_normalizer_test.go."""

import pytest

from north_cloud_ray.stages.domain_rules import mining_drill_keyword
from north_cloud_ray.stages.drill import (
    extract_drill_regex,
    normalize_commodity,
    normalize_drill_results,
    normalize_unit,
)


def test_intercept_at_grade():
    body = "Drill hole DDH-24-001 returned 12.5m @ 3.2 g/t Au from 45.0m."
    results, confidence = extract_drill_regex(body)
    assert confidence == "complete"
    assert len(results) == 1
    r = results[0]
    assert r["hole_id"] == "DDH-24-001"
    assert r["intercept_m"] == 12.5
    assert r["grade"] == 3.2
    assert r["unit"] == "g/t"


def test_multiple_holes():
    body = """Highlights include:
    DDH-24-001: 12.5m @ 3.2 g/t Au
    DDH-24-002: 8.0m @ 1.5% Cu
    RC-001: 15.0 metres @ 0.8 g/t Au"""
    results, confidence = extract_drill_regex(body)
    assert confidence == "complete"
    assert len(results) >= 3


def test_from_to_interval():
    body = ("Hole BH-001 intersected gold mineralization from 45.0m to "
            "57.5m grading 2.1 g/t Au")
    results, confidence = extract_drill_regex(body)
    assert confidence != "none"
    assert any(r["intercept_m"] == 12.5 for r in results)


def test_percent_copper():
    body = "DDH-24-003 returned 20.0m @ 1.8% Cu including 5.0m @ 3.2% Cu"
    results, _ = extract_drill_regex(body)
    assert results
    assert any(r["unit"] == "%" for r in results)


def test_no_results():
    results, confidence = extract_drill_regex(
        "The company announced a new mining project in northern Ontario.")
    assert confidence == "none"
    assert results == []


def test_partial_signal():
    _, confidence = extract_drill_regex(
        "Drill holes DDH-24-001 and DDH-24-002 were completed. "
        "Results are pending.")
    assert confidence == "partial"


def test_mining_rules_drill_keyword_flag():
    # TestClassifyMiningWithDrillExtraction / NoDrillKeyword
    assert mining_drill_keyword(
        "Company Reports Drill Results",
        "Drill hole DDH-24-001 returned 12.5m @ 3.2 g/t Au from 45.0m "
        "depth in the Main Zone.") is True
    assert mining_drill_keyword(
        "Gold Mining Company Expands Operations",
        "The company is expanding its open-pit mining operations.") is False


@pytest.mark.parametrize("raw,want", [
    ("Au", "gold"), ("au", "gold"), ("Ag", "silver"), ("Cu", "copper"),
    ("Ni", "nickel"), ("Zn", "zinc"), ("Li", "lithium"),
    ("U3O8", "uranium"), ("Pb", "lead"), ("gold", "gold"),
    ("Gold", "gold"), ("COPPER", "copper"), ("unknown", "unknown"),
    ("", ""),
])
def test_normalize_commodity(raw, want):
    assert normalize_commodity(raw) == want


@pytest.mark.parametrize("raw,want", [
    ("g/t", "g/t"), ("gpt", "g/t"), ("g per tonne", "g/t"),
    ("grams per tonne", "g/t"), ("%", "%"), ("percent", "%"),
    ("ppm", "ppm"), ("parts per million", "ppm"), ("oz/t", "oz/t"),
])
def test_normalize_unit(raw, want):
    assert normalize_unit(raw) == want


def test_normalize_results_dedup():
    rows = [
        {"hole_id": "DDH-24-001", "commodity": "Au", "intercept_m": 12.5,
         "grade": 3.2, "unit": "g/t"},
        {"hole_id": "DDH-24-001", "commodity": "Au", "intercept_m": 12.5,
         "grade": 3.2, "unit": "g/t"},
        {"hole_id": "DDH-24-002", "commodity": "Cu", "intercept_m": 8.0,
         "grade": 1.5, "unit": "%"},
    ]
    assert len(normalize_drill_results(rows)) == 2


def test_normalize_results_drops_invalid():
    rows = [
        {"hole_id": "DDH-24-001", "commodity": "Au", "intercept_m": 12.5,
         "grade": 3.2, "unit": "g/t"},
        {"hole_id": "", "commodity": "Au", "intercept_m": 0,
         "grade": 0, "unit": "g/t"},
    ]
    assert len(normalize_drill_results(rows)) == 1


def test_normalize_results_normalizes_fields():
    got = normalize_drill_results([
        {"hole_id": "DDH-24-001", "commodity": "Au", "intercept_m": 12.5,
         "grade": 3.2, "unit": "gpt"},
    ])
    assert len(got) == 1
    assert got[0]["commodity"] == "gold"
    assert got[0]["unit"] == "g/t"
    assert got[0]["hole_id"] == "DDH-24-001"
