"""Parity vectors for the crime-sidecar rule engine, ported from the
reference's classifier/internal/classifier/crime_rules_test.go."""

import pytest

from north_cloud_ray.stages.crime_rules import classify_crime_rules

# ViolentCrime rows: (title, want_relevance, want types present)
VIOLENT_VECTORS = [
    ("Man charged with murder after stabbing", "core_street_crime",
     ["violent_crime"]),
    ("Police respond to downtown shooting", "core_street_crime",
     ["violent_crime"]),
    ("Suspect arrested for assault in park", "core_street_crime",
     ["violent_crime"]),
]


@pytest.mark.parametrize("title,want_rel,want_types", VIOLENT_VECTORS)
def test_violent_crime_vectors(title, want_rel, want_types):
    rel, _conf, types = classify_crime_rules(title, "")
    assert rel == want_rel
    for t in want_types:
        assert t in types


@pytest.mark.parametrize("title", [
    "Full-Time Position Available",
    "Listings By Category",
    # exclusion fires on the (Part.Time|Full.Time|Hiring|Position) and
    # ^Local Sports... patterns
    "Local Sports Updates",
])
def test_exclusion_vectors(title):
    rel, conf, types = classify_crime_rules(title, "")
    assert rel == "not_crime"


def test_exclusion_confidence():
    rel, conf, types = classify_crime_rules("Full-Time Position Available", "")
    assert (rel, conf, types) == ("not_crime", 0.95, [])


@pytest.mark.parametrize("title", [
    "New restaurant opens downtown",
    "Weekend forecast looks sunny",
    "Hockey team wins championship",
])
def test_not_crime_vectors(title):
    rel, conf, _ = classify_crime_rules(title, "")
    assert rel == "not_crime"
    assert conf == pytest.approx(0.5)


@pytest.mark.parametrize("title", [
    "Opinion: Crime rates are a political tool",
    "Editorial: Why policing needs reform",
    "Commentary: The murder rate debate",
    "Column: My thoughts on gang violence",
    "Op-Ed: Drug policy has failed us",
    "Letters: Readers respond to shooting coverage",
    "I think the police response was inadequate",
])
def test_opinion_exclusion_vectors(title):
    assert classify_crime_rules(title, "")[0] == "not_crime"


@pytest.mark.parametrize("title", [
    "7 best house renovation contractors in the area",
    "PUBG online tournament finals this weekend",
    "A new lifeline for anyone travelling through BC",
    "Best recipe for a killer BBQ sauce",
    "Best contractors in the Vancouver area",
])
def test_lifestyle_exclusion_vectors(title):
    assert classify_crime_rules(title, "")[0] == "not_crime"


@pytest.mark.parametrize("title", [
    "Police investigate murder in downtown Toronto",
    "RCMP respond to shooting at mall",
    "Man arrested after stabbing outside bar",
    "Police drug bust seizes fentanyl in Vancouver",
    "Suspect charged with sexual assault",
    "Woman found dead, police launch investigation",
    "Man sentenced to life for murder of wife",
])
def test_requires_authority_core_vectors(title):
    assert classify_crime_rules(title, "")[0] == "core_street_crime"


@pytest.mark.parametrize("title", [
    "Murder on the Orient Express returns to stage",
    "Shooting for the stars: local athlete's journey",
    "Stabbing mechanics in new action RPG reviewed",
])
def test_requires_authority_non_core_vectors(title):
    assert classify_crime_rules(title, "")[0] != "core_street_crime"


@pytest.mark.parametrize("title", [
    "Repeat offender among two arrested in store robbery",
    "Armed robbery at downtown convenience store, police investigating",
    "RCMP investigating bank robbery in Sudbury",
    "Police arrest suspect in violent carjacking incident",
    "Man charged with kidnapping after Amber Alert",
    "Police searching for suspect in child abduction",
    "Hostage situation ends with arrest by tactical unit",
    "Suspect taken into custody after downtown stabbing",
    "Manhunt underway after shooting in North Bay",
])
def test_missing_pattern_vectors(title):
    rel, _conf, types = classify_crime_rules(title, "")
    assert rel == "core_street_crime"
    assert "violent_crime" in types


@pytest.mark.parametrize("title", [
    "Man sentenced to 15 years in prison for armed robbery",
    "Jury convicts accused in deadly shooting case",
    "Woman found guilty of fraud by judge",
    "Teen pleaded guilty to assault charges in court",
    "Judge hands down prison term for drug trafficking ring leader",
])
def test_court_outcome_vectors(title):
    rel, _conf, types = classify_crime_rules(title, "")
    assert rel == "core_street_crime"
    assert "criminal_justice" in types


@pytest.mark.parametrize("title,want_types", [
    ("Mississaugas of the Credit First Nation resident faces drug, "
     "weapon, assault charges", ["violent_crime", "drug_crime"]),
    ("Man facing assault and weapon charges", ["violent_crime"]),
    ("Woman charged with drug charges after traffic stop", ["drug_crime"]),
])
def test_accusation_charges_vectors(title, want_types):
    rel, _conf, types = classify_crime_rules(title, "")
    assert rel == "core_street_crime"
    for t in want_types:
        assert t in types


@pytest.mark.parametrize("title", [
    "Suspect faces weapon charges after search",
    "Police make arrest in weapons case",
])
def test_weapon_authority_vectors(title):
    rel, _conf, types = classify_crime_rules(title, "")
    assert rel == "core_street_crime"
    assert "violent_crime" in types


def test_title_and_body_prefix():
    rel, _conf, types = classify_crime_rules(
        "Two charged",
        "Police said the two suspects were arrested after an armed robbery "
        "at a convenience store. The incident occurred Tuesday night.")
    assert rel == "core_street_crime"
    assert "violent_crime" in types

    # exclusion remains title-only
    rel2, _, _ = classify_crime_rules(
        "Register for updates",
        "Police arrested a man after a shooting downtown. The suspect is "
        "in custody.")
    assert rel2 == "not_crime"


def test_body_truncation_at_500_chars():
    # crime signal past the 500-char prefix must NOT trigger
    filler = "neutral words " * 40  # > 500 chars
    rel, _, _ = classify_crime_rules(
        "Community update", filler + " police arrested a murder suspect")
    assert rel == "not_crime"
    # within the prefix it does trigger
    rel2, _, _ = classify_crime_rules(
        "Community update", "police arrested a murder suspect " + filler)
    assert rel2 == "core_street_crime"


def test_international_downgrade():
    # core crime with an international marker in the title downgrades
    rel, conf, types = classify_crime_rules(
        "U.S. police investigate murder in Minneapolis", "")
    assert rel == "peripheral_crime"
    assert conf == pytest.approx(0.95 * 0.7)
    assert "violent_crime" in types
    # non-core international title stays not_crime (no downgrade applied)
    rel2, _, _ = classify_crime_rules("U.S. markets rally on tech gains", "")
    assert rel2 == "not_crime"


def test_unconditional_justice_append_matches_reference():
    # court-outcome text: criminal_justice appended twice (reference's
    # final append has no dedup, crime_rules.go:185-187)
    _, _, types = classify_crime_rules(
        "Man sentenced to 15 years in prison for armed robbery", "")
    assert types.count("criminal_justice") == 2
