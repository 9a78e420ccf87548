"""Topic-scoring parity vectors ported from the reference's
classifier/internal/classifier/topic_test.go ScoreTextAgainstRule /
Classify families (substring trap, repeated keywords, punctuation,
long/short documents, multi-word keywords, accented keywords, the
drug-crime-vs-sex-trafficking and travel-context discriminations)."""

from collections import Counter

import pytest

from north_cloud_ray.config import TopicRule
from north_cloud_ray.stages.classify import (
    _PUNCT_RE,
    classify_topics,
    score_rule,
)


def _score(text: str, keywords, min_confidence: float = 0.1) -> float:
    """scoreTextAgainstRule harness: same cleaning as classify_topics."""
    cleaned = _PUNCT_RE.sub(" ", text.lower())
    return score_rule(cleaned, Counter(cleaned.split()),
                      TopicRule("t", tuple(keywords),
                                min_confidence=min_confidence))


RULE4 = ("police", "arrest", "murder", "investigation")


@pytest.mark.parametrize("text,lo,hi", [
    ("police arrest murder investigation", 0.8, 1.0),
    ("police arrest other words", 0.4, 0.7),
    ("completely different content", 0.0, 0.0),
    ("the police were present", 0.1, 0.4),
])
def test_score_text_against_rule_ranges(text, lo, hi):
    s = _score(text, RULE4)
    assert lo <= s <= hi


def test_substring_trap():
    # "shoot" keyword must NOT match the word "shooting"
    assert _score("shooting shooting shooting", ["shoot"]) == 0.0


def test_repeated_keywords_score_higher():
    single = _score("there was a shooting incident", ["shooting"])
    multiple = _score(
        "shooting shooting shooting shooting shooting happened",
        ["shooting"])
    assert multiple > single
    assert multiple >= 0.3


@pytest.mark.parametrize("text", [
    "there was a shooting, and it was serious",
    "there was a shooting. it was serious",
    "there was a shooting! it was serious",
])
def test_punctuation_does_not_block_matches(text):
    assert _score(text, ["shooting"]) > 0.0


def test_long_document_log_tf_normalization():
    long_text = "word " * 5001 + "shooting police arrest"
    s = _score(long_text, ["shooting", "police", "arrest"])
    assert 0.3 <= s <= 1.0


def test_short_document_dense_matches():
    s = _score("shooting shooting police arrest shooting",
               ["shooting", "police", "arrest"])
    assert s >= 0.5


def test_empty_and_no_match_score_zero():
    assert _score("", ["police", "arrest"]) == 0.0
    assert _score("completely unrelated content here",
                  ["police", "arrest"]) == 0.0


@pytest.mark.parametrize("text,want_zero", [
    ("authorities investigate human trafficking ring in the city", False),
    ("organized crime linked to human trafficking operations", False),
    ("the trafficking of goods across borders is organized", True),
    ("", True),
])
def test_multiword_keywords(text, want_zero):
    s = _score(text, ["human trafficking", "organized crime"])
    assert (s == 0.0) is want_zero


@pytest.mark.parametrize("text,lo,hi", [
    ("police found drug and drugs at the scene", 0.2, 0.8),
    ("a major drug trafficking operation led to a drug bust", 0.3, 1.0),
    ("drug trafficking ring busted in major drug bust with drugs seized",
     0.5, 1.0),
])
def test_mixed_single_and_multiword(text, lo, hi):
    s = _score(text, ["drug", "drugs", "drug trafficking", "drug bust"],
               min_confidence=0.3)
    assert lo <= s <= hi


@pytest.mark.parametrize("text,keywords,want_match", [
    ("Les Métis du Manitoba se réunissent", ["métis"], True),
    ("Les premières nations du Canada annoncent un accord",
     ["premières nations"], True),
    ("Métis community celebrates résultats at the annual powwow",
     ["métis", "powwow", "résultats"], True),
    ("PREMIÈRES NATIONS DU QUÉBEC",
     ["premières nations", "québec"], True),
    ("The premieres nations group met today", ["premières nations"], False),
    ("Les premières nations du Canada", ["premieres nations"], False),
    ("Los pueblos indígenas de América celebran",
     ["pueblos indígenas"], True),
    ("Le français est parlé dans la forêt", ["français", "forêt"], True),
])
def test_accented_keywords(text, keywords, want_match):
    assert (_score(text, keywords) > 0) is want_match


DRUG_CRIME_KEYWORDS = (
    "drug", "drugs", "narcotics", "dealer", "possession",
    "cocaine", "heroin", "fentanyl", "methamphetamine", "meth",
    "marijuana", "cannabis", "opioid",
    "drug bust", "drug ring", "cartel", "smuggling", "drug trafficking",
    "narcotics trafficking", "fentanyl trafficking", "cocaine trafficking",
    "meth trafficking", "overdose", "drug-related", "controlled substance",
)

TRAVEL_KEYWORDS = (
    "vacation", "hotel", "flight", "tourism", "travel",
    "journey", "tour", "tourist", "resort", "airline", "airport",
    "luggage", "cruise", "beach", "sightseeing", "adventure",
    "backpacking", "travel guide", "itinerary", "booking", "reservation",
)


def _topics(title, text, name, keywords, mc):
    rules = (TopicRule(name, tuple(keywords), min_confidence=mc),)
    return [t for t, _s in classify_topics(title, text, rules)]


def test_drug_crime_does_not_match_sex_trafficking():
    topics = _topics(
        "Alexander brothers are convicted of sex trafficking in case that "
        "shocked real estate world",
        "Two brothers were convicted of sex trafficking charges after a "
        "lengthy trial. The case involved multiple victims who were "
        "trafficked across state lines. Prosecutors described the "
        "trafficking ring as one of the most organized in recent history.",
        "drug_crime", DRUG_CRIME_KEYWORDS, 0.3)
    assert "drug_crime" not in topics


def test_drug_crime_matches_drug_trafficking():
    topics = _topics(
        "Major fentanyl trafficking ring busted in downtown",
        "Police arrested several suspects in a major drug trafficking "
        "operation. Officers seized large quantities of fentanyl and "
        "cocaine during the drug bust. The narcotics trafficking ring had "
        "been under investigation for months.",
        "drug_crime", DRUG_CRIME_KEYWORDS, 0.3)
    assert "drug_crime" in topics


def test_travel_does_not_match_trafficking_context():
    topics = _topics(
        "Trafficking victims brought to destination country via forged "
        "passport",
        "Victims were given forged visas and passports. The trafficking "
        "ring used a network of safe houses as destinations. Authorities "
        "tracked the trip from origin to destination.",
        "travel", TRAVEL_KEYWORDS, 0.4)
    assert "travel" not in topics


def test_travel_matches_genuine_travel_content():
    topics = _topics(
        "Best beach resorts for your summer vacation",
        "Planning your next vacation? Check out these amazing beach "
        "resorts. Book your hotel and flight together for the best deals. "
        "Tourism is booming at these resort destinations.",
        "travel", TRAVEL_KEYWORDS, 0.4)
    assert "travel" in topics


def test_accented_keywords_in_topic_rule():
    kws = ("premières nations", "métis", "pueblos indígenas", "autochtone")
    assert "indigenous" in _topics(
        "Les Premières Nations du Québec",
        "Les premières nations et les Métis se réunissent pour discuter "
        "des droits autochtone",
        "indigenous", kws, 0.5)
    assert "indigenous" in _topics(
        "Pueblos Indígenas de América",
        "Los pueblos indígenas y métis celebran su herencia autochtone en "
        "una conferencia global",
        "indigenous", kws, 0.5)
    assert _topics(
        "Premieres Nations Meeting",
        "The premieres nations group held a meeting about community "
        "matters today",
        "indigenous", kws, 0.5) == []
