"""Parity vectors for the indigenous-sidecar rule engine, ported from
the reference's classifier/internal/classifier/indigenous_rules_test.go."""

import pytest

from north_cloud_ray.stages.indigenous_rules import (
    CONFIDENCE_CORE_BASE,
    CONFIDENCE_CORE_MAX,
    CONFIDENCE_NOT_INDIGENOUS,
    INDIGENOUS_CATEGORIES,
    INDIGENOUS_CATEGORY_KEYWORDS,
    classify_indigenous_rules,
)


@pytest.mark.parametrize("title", [
    "Anishinaabe community gathers",
    "First Nations leaders meet",
    "Métis nation celebrates heritage",
    "Inuit hunters adapt to climate change",
    "Treaty rights affirmed by court",
    "Māori iwi gather for annual hui",
    "Aboriginal Australian elders share stories",
    "Native Hawaiian sovereignty movement grows",
    "Tribal sovereignty affirmed in ruling",
    "Sami people protest mining expansion",
    "Tangata whenua speak at hearing",
])
def test_english_core_vectors(title):
    assert classify_indigenous_rules(title, "")[0] == "core_indigenous"


@pytest.mark.parametrize("title", [
    "Pueblos indígenas exigen derechos",
    "Territorio ancestral bajo amenaza",
])
def test_spanish_core_vectors(title):
    assert classify_indigenous_rules(title, "")[0] == "core_indigenous"


@pytest.mark.parametrize("title", [
    "Les peuples autochtones manifestent",
    "Les premières nations signent un accord",
])
def test_french_core_vectors(title):
    assert classify_indigenous_rules(title, "")[0] == "core_indigenous"


def test_portuguese_core_vector():
    assert classify_indigenous_rules(
        "Povos indígenas lutam pela demarcação", "")[0] == "core_indigenous"


@pytest.mark.parametrize("title", [
    "Samefolket kämpar för rättigheter",
    "Urfolk i Norden organiserar",
    "Sápmi region faces new challenges",
])
def test_nordic_core_vectors(title):
    assert classify_indigenous_rules(title, "")[0] == "core_indigenous"


@pytest.mark.parametrize("title", [
    "アイヌ民族の文化復興運動",
    "先住民族の権利に関する宣言",
])
def test_japanese_core_vectors(title):
    assert classify_indigenous_rules(title, "")[0] == "core_indigenous"


@pytest.mark.parametrize("title", [
    "Indigenous art exhibit opens",
    "Reconciliation efforts continue",
    "Autochtone community event",
])
def test_peripheral_vectors(title):
    assert classify_indigenous_rules(title, "")[0] == "peripheral_indigenous"


@pytest.mark.parametrize("title,body", [
    ("Weather forecast: sunny skies", "Expected high of 25 degrees."),
    ("El clima de hoy es soleado", ""),
    ("La météo prévoit du beau temps", ""),
])
def test_not_indigenous_vectors(title, body):
    rel, conf = classify_indigenous_rules(title, body)
    assert rel == "not_indigenous"
    assert conf == pytest.approx(CONFIDENCE_NOT_INDIGENOUS)


def test_body_truncation():
    long_body = "\x00" * 600 + " Anishinaabe"
    assert classify_indigenous_rules(
        "Weather news", long_body)[0] == "not_indigenous"


def test_category_taxonomy():
    assert len(INDIGENOUS_CATEGORIES) == 10
    assert set(INDIGENOUS_CATEGORIES) == {
        "culture", "language", "land_rights", "environment", "sovereignty",
        "education", "health", "justice", "history", "community"}
    assert len(set(INDIGENOUS_CATEGORIES)) == 10
    for cat in INDIGENOUS_CATEGORIES:
        assert INDIGENOUS_CATEGORY_KEYWORDS[cat]


def test_confidence_scoring():
    _, core_conf = classify_indigenous_rules("Inuit hunters report changes", "")
    assert core_conf >= CONFIDENCE_CORE_BASE

    _, single = classify_indigenous_rules(
        "First Nations leaders discuss issues", "")
    _, multi = classify_indigenous_rules(
        "First Nations and Métis leaders discuss treaty rights", "")
    assert multi >= single

    _, core = classify_indigenous_rules(
        "Anishinaabe community celebrates culture", "")
    _, periph = classify_indigenous_rules("Indigenous art exhibit opens", "")
    assert periph < core

    _, capped = classify_indigenous_rules(
        "First Nations Métis Inuit treaty rights residential school "
        "Anishinaabe grand council", "")
    assert capped <= CONFIDENCE_CORE_MAX


def test_exact_confidence_formula():
    # 1 core hit (anishinaabe), 1 category (community) -> 0.6+0.1+0.03
    _, conf = classify_indigenous_rules("Anishinaabe community gathers", "")
    assert conf == pytest.approx(0.6 + 0.1 + 0.03)
