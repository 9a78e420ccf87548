"""Quality-scorer parity vectors ported from the reference's
classifier/internal/classifier/quality_test.go (full four-component
0-100 scorer over real metadata fields)."""

import pytest

from north_cloud_ray.stages.classify import (
    metadata_quality,
    quality_score_full,
    readability_quality,
    richness_quality,
    word_count_quality,
)


@pytest.mark.parametrize("wc,want", [
    (50, 0), (100, 10), (250, 10), (400, 15), (700, 20), (1200, 25),
])
def test_word_count_score_vectors(wc, want):
    assert word_count_quality(wc) == want


@pytest.mark.parametrize("kwargs,want", [
    ({}, 0),
    ({"title": "Test"}, 5),
    ({"title": "Test", "meta_description": "Description"}, 10),
    ({"title": "Test", "meta_description": "Description",
      "has_published_date": True, "og_title": "OG Title",
      "meta_keywords": "keywords"}, 25),
])
def test_metadata_score_vectors(kwargs, want):
    assert metadata_quality(**kwargs) == want


@pytest.mark.parametrize("kwargs,want", [
    ({}, 0),
    ({"og_image": "https://example.com/image.jpg"}, 10),
    ({"meta_keywords": "keyword1, keyword2"}, 5),
    ({"og_image": "https://example.com/image.jpg",
      "meta_keywords": "keywords",
      "canonical_url": "https://example.com/canonical",
      "og_type": "article", "og_url": "https://example.com/og"}, 25),
])
def test_richness_score_vectors(kwargs, want):
    assert richness_quality(**kwargs) == want


def test_readability_tiers():
    assert readability_quality(250) == 20
    assert readability_quality(150) == 15
    assert readability_quality(50) == 10


def test_high_quality_content():
    score = quality_score_full(
        1200, title="Comprehensive News Article",
        meta_description="A detailed description of the article",
        meta_keywords="news, breaking, important",
        og_title="Comprehensive News Article",
        og_description="A detailed description",
        og_image="https://example.com/image.jpg",
        og_url="https://example.com/article", og_type="article",
        canonical_url="https://example.com/article",
        has_published_date=True)
    assert score > 75
    # word-count component is maxed at 1200 words
    assert word_count_quality(1200) == 25


def test_low_quality_content():
    assert quality_score_full(50, title="Short") < 40


def test_medium_quality_content():
    score = quality_score_full(
        400, title="Decent Article",
        meta_description="A brief description",
        og_image="https://example.com/image.jpg")
    assert 40 <= score <= 75


def test_custom_config_thresholds():
    # quality.go NewQualityScorerWithConfig: MinWordCount/OptimalWordCount
    assert word_count_quality(150, min_word_count=200) == 0
    assert word_count_quality(600, optimal_word_count=600) == 25
