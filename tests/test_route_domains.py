"""Publisher routing-domain parity vectors, ported from the reference's
publisher/internal/router test files (domain_topic_test.go,
crime_test.go, location_test.go, mining.go semantics,
entertainment.go, indigenous.go, domain_coforge_test.go,
domain_recipe.go, domain_job.go, domain_rfp.go,
domain_need_signal.go)."""

import pytest

from north_cloud_ray.stages.publish import Channel
from north_cloud_ray.stages.route_domains import (
    route_coforge,
    route_crime,
    route_db_channels,
    route_entertainment,
    route_indigenous,
    route_item,
    route_job,
    route_location,
    route_mining,
    route_need_signal,
    route_recipe,
    route_rfp,
    route_topics,
)


@pytest.mark.parametrize("topics,want", [
    (["violent_crime", "local_news"],
     ["content:violent_crime", "content:local_news"]),
    ([], []),
    (["news", "mining", "technology"], ["content:news", "content:technology"]),
    (["news", "indigenous"], ["content:news"]),
    (["news", "coforge"], ["content:news"]),
    (["mining", "indigenous", "coforge"], []),
])
def test_topic_domain_vectors(topics, want):
    assert route_topics({"topics": topics}) == want


def test_crime_domain_vectors():
    core = {"crime_relevance": "core_street_crime",
            "homepage_eligible": True,
            "category_pages": ["violent-crime", "crime"]}
    got = route_crime(core)
    assert "crime:homepage" in got
    assert "crime:category:violent-crime" in got
    assert "crime:category:crime" in got

    assert route_crime({"crime_relevance": "not_crime"}) == []
    assert route_crime({}) == []
    assert route_crime({"crime_relevance": "peripheral_crime",
                        "crime_sub_label": "criminal_justice"}) == \
        ["crime:courts"]
    assert route_crime({"crime_relevance": "peripheral_crime",
                        "crime_sub_label": "crime_context"}) == \
        ["crime:context"]
    # default sub-label -> context
    assert route_crime({"crime_relevance": "peripheral_crime"}) == \
        ["crime:context"]


def test_location_domain_vectors():
    # international crime item -> crime:international only
    intl = {"crime_relevance": "core_street_crime",
            "location_country": "usa"}
    assert route_location(intl) == ["crime:international"]
    # Canadian city-specific -> local + province + canada
    can = {"crime_relevance": "core_street_crime",
           "location_country": "canada", "location_city": "vancouver",
           "location_province": "BC", "location_specificity": "city"}
    assert route_location(can) == [
        "crime:local:vancouver", "crime:province:bc", "crime:canada"]
    # unknown country or no active classifier -> nothing
    assert route_location({"location_country": "unknown",
                           "crime_relevance": "core_street_crime"}) == []
    assert route_location({"location_country": "canada"}) == []
    # entertainment prefix activates independently
    ent = {"entertainment": {"relevance": "core_entertainment"},
           "location_country": "canada", "location_province": "ON"}
    assert route_location(ent) == [
        "entertainment:province:on", "entertainment:canada"]


def test_mining_domain_vectors():
    m = {"mining": {"relevance": "core_mining",
                    "commodities": ["gold", "iron_ore"],
                    "mining_stage": "Exploration",
                    "location": "local_canada"}}
    assert route_mining(m) == [
        "content:mining", "mining:core", "mining:commodity:gold",
        "mining:commodity:iron-ore", "mining:stage:exploration",
        "mining:canada"]
    assert route_mining({"mining": {"relevance": "not_mining"}}) == []
    assert route_mining({}) == []
    p = {"mining": {"relevance": "peripheral_mining",
                    "location": "international"}}
    assert route_mining(p) == ["content:mining", "mining:peripheral",
                               "mining:international"]
    # unspecified stage is skipped
    u = {"mining": {"relevance": "core_mining",
                    "mining_stage": "unspecified"}}
    assert route_mining(u) == ["content:mining", "mining:core"]


def test_entertainment_domain_vectors():
    e = {"entertainment": {"relevance": "core_entertainment",
                           "homepage_eligible": True,
                           "categories": ["Film", "Live Music"]}}
    assert route_entertainment(e) == [
        "entertainment:homepage", "entertainment:category:film",
        "entertainment:category:live-music"]
    assert route_entertainment(
        {"entertainment": {"relevance": "peripheral_entertainment"}}) == \
        ["entertainment:peripheral"]
    assert route_entertainment(
        {"entertainment": {"relevance": "not_entertainment"}}) == []


def test_indigenous_domain_vectors():
    ind = {"indigenous": {"relevance": "core_indigenous",
                          "final_confidence": 0.8,
                          "categories": ["culture", "land rights"],
                          "region": "latin-america"}}
    assert route_indigenous(ind) == [
        "content:indigenous", "indigenous:category:culture",
        "indigenous:category:land-rights",
        "indigenous:region:latin_america"]
    # below the 0.35 confidence gate -> nothing
    low = {"indigenous": {"relevance": "core_indigenous",
                          "final_confidence": 0.2}}
    assert route_indigenous(low) == []
    # invalid region slug is dropped, not raised
    bad = {"indigenous": {"relevance": "peripheral_indigenous",
                          "final_confidence": 0.5, "region": "atlantis"}}
    assert route_indigenous(bad) == ["content:indigenous"]


@pytest.mark.parametrize("coforge,want", [
    ({"relevance": "core_coforge", "audience": "developer"},
     ["coforge:core", "coforge:audience:developer"]),
    ({"relevance": "peripheral", "audience": "entrepreneur"},
     ["coforge:peripheral", "coforge:audience:entrepreneur"]),
    ({"relevance": "core_coforge", "audience": "hybrid"},
     ["coforge:core", "coforge:audience:hybrid"]),
    ({"relevance": "core_coforge", "audience": "developer",
      "topics": ["framework_release", "open_source"]},
     ["coforge:core", "coforge:audience:developer",
      "coforge:topic:framework-release", "coforge:topic:open-source"]),
    ({"relevance": "core_coforge", "audience": "hybrid",
      "industries": ["ai_ml", "saas"]},
     ["coforge:core", "coforge:audience:hybrid",
      "coforge:industry:ai-ml", "coforge:industry:saas"]),
    ({"relevance": "core_coforge", "audience": "hybrid",
      "topics": ["funding_round", "devtools"],
      "industries": ["saas", "ai_ml"]},
     ["coforge:core", "coforge:audience:hybrid",
      "coforge:topic:funding-round", "coforge:topic:devtools",
      "coforge:industry:saas", "coforge:industry:ai-ml"]),
    # unknown relevance returns nothing (no partial routing)
    ({"relevance": "core_coforge_v2", "audience": "developer"}, []),
    ({"relevance": "not_relevant"}, []),
    ({"relevance": ""}, []),
    # audience slug normalization
    ({"relevance": "core_coforge", "audience": "IT_Decision Maker"},
     ["coforge:core", "coforge:audience:it-decision-maker"]),
])
def test_coforge_domain_vectors(coforge, want):
    assert route_coforge({"coforge": coforge}) == want


def test_structured_extractor_domains():
    assert route_recipe({"recipe": {"category": "Dessert",
                                    "cuisine": "Italian"}}) == \
        ["content:recipes", "recipes:category:dessert",
         "recipes:cuisine:italian"]
    assert route_recipe({}) == []
    assert route_job({"job": {"employment_type": "full_time",
                              "industry": "Technology"}}) == \
        ["content:jobs", "jobs:type:full-time", "jobs:industry:technology"]
    assert route_rfp({"rfp": {"country": "Canada", "province": "ON",
                              "categories": ["Road Work"],
                              "procurement_type": "request for proposal"}}) \
        == ["content:rfps", "rfp:country:canada", "rfp:province:on",
            "rfp:sector:road-work", "rfp:type:request-for-proposal"]
    assert route_need_signal(
        {"need_signal": {"signal_type": "funding_win", "province": "ON",
                         "sector": "municipal"}}) == \
        ["content:need-signals", "need-signal:type:funding_win",
         "need-signal:province:on", "need-signal:sector:municipal"]


def test_db_channel_domain():
    channels = (
        Channel("content:crime", include_topics=("crime",), min_quality=40),
        Channel("content:all-articles", min_quality=50),
    )
    item = {"topics": ["crime"], "quality_score": 60,
            "content_type": "article"}
    assert route_db_channels(item, channels) == [
        "content:crime", "content:all-articles"]
    # quality gate
    item2 = {"topics": ["crime"], "quality_score": 30,
             "content_type": "article"}
    assert route_db_channels(item2, channels) == []


def test_route_item_fixed_order_and_dedup():
    item = {
        "topics": ["crime"], "quality_score": 60,
        "content_type": "article",
        "crime_relevance": "core_street_crime",
        "homepage_eligible": True, "category_pages": ["crime"],
        "location_country": "canada", "location_province": "ON",
        "location_city": "sudbury", "location_specificity": "city",
    }
    channels = (Channel("content:crime", include_topics=("crime",),
                        min_quality=40),)
    got = route_item(item, channels)
    # Layer-1 topic channel first; the DB-channel duplicate collapses
    assert got[0] == "content:crime"
    assert got.count("content:crime") == 1
    assert got.index("crime:homepage") < got.index("crime:local:sudbury")
    assert "crime:canada" in got
