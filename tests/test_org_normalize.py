"""Org-normalization parity vectors, ported from the reference's
infrastructure/signal/org_normalize_test.go."""

import pytest

from north_cloud_ray.stages.org_normalize import (
    from_email,
    from_url,
    normalize,
    resolve,
)


@pytest.mark.parametrize("raw,want", [
    ("", ""), ("   ", ""), ("Acme", "acme"), ("AcMe", "acme"),
    ("Acme Inc", "acme"), ("Acme Inc.", "acme"),
    ("Acme Corporation", "acme"), ("Acme LLC", "acme"),
    ("Acme, Inc.", "acme"), ("acme-corp.com", "acme"),
    ("acme-corp", "acme"),
    ("Acme Holdings Group", "acme-holdings-group"),
    ("Acme & Sons!", "acme-sons"), ("!!Acme!!", "acme"),
    ("Big Blue Widget Co.", "big-blue-widget"),
])
def test_normalize_vectors(raw, want):
    assert normalize(raw) == want


def test_canonical_parity():
    forms = ("Acme Corporation", "Acme Corp", "ACME CORP.",
             "acme-corp.com", "Acme-Corp", "acme corp")
    assert all(normalize(f) == "acme" for f in forms)


@pytest.mark.parametrize("raw,want", [
    ("ops@acme-corp.com", "acme"), ("OPS@ACME-CORP.COM", "acme"),
    ("hr@careers.acme.com", "acme"), ("info@acme.co.uk", "acme"),
    ("contact@agency.gc.ca", "agency"), ("  ops@acme.com  ", "acme"),
    ("not-an-email", ""), ("", ""), ("ops@", ""), ("ops@acme", ""),
])
def test_from_email_vectors(raw, want):
    assert from_email(raw) == want


@pytest.mark.parametrize("raw,want", [
    ("https://acme-corp.com/path", "acme"),
    ("http://acme.com:8080/path", "acme"),
    ("https://www.acme.com", "acme"),
    ("https://blog.acme-corp.com/a/b", "acme"),
    ("https://ACME.COM", "acme"),
    ("https://example.co.uk/", "example"),
    ("https://agency.gc.ca/page", "agency"),
    ("", ""), ("justtext", ""), ("/path/only", ""),
])
def test_from_url_vectors(raw, want):
    assert from_url(raw) == want


@pytest.mark.parametrize("explicit,email,url,want", [
    ("Acme Corp", "ops@other.com", "https://somewhere.com", "acme"),
    ("", "ops@acme-corp.com", "https://other.com", "acme"),
    ("", "", "https://acme.com/page", "acme"),
    ("", "not-an-email", "https://acme.com", "acme"),
    ("   ", "ops@acme.com", "", "acme"),
    ("", "", "", ""),                       # ErrNoOrganization case
    ("   ", "not-an-email", "/relative/path", ""),
])
def test_resolve_vectors(explicit, email, url, want):
    assert resolve(explicit, email, url) == want


def test_need_signal_emits_normalized_org():
    """need_signal_extractor_test.go Extract scenarios: the normalized
    org slug prefers the title-extracted hint over the email domain."""
    from north_cloud_ray.stages.structured import extract_need_signal

    r = extract_need_signal(
        "City of Thunder Bay - Website Redesign Project",
        "The City of Thunder Bay is seeking proposals for a complete "
        "website redesign. The current site runs on Drupal 7, which has "
        "reached end of life. The legacy website must be migrated to a "
        "modern platform. For inquiries, contact jsmith@thunderbay.ca.",
        url="https://thunderbay.ca/redesign")
    assert r is not None
    assert r["signal_type"] == "outdated_website"
    assert "Thunder Bay" in r["organization_name"]
    assert r["organization_name_normalized"] == "city-of-thunder-bay"
    assert r["contact_email"] == "jsmith@thunderbay.ca"

    r2 = extract_need_signal(
        "Sagamok Anishnawbek receives digital capacity grant",
        "Sagamok Anishnawbek has been awarded grant funding for digital "
        "capacity building. The funding announcement confirms "
        "infrastructure funding to support digital transformation "
        "initiatives across the community.",
        url="https://sagamok.ca/news/grant")
    assert r2 is not None
    assert r2["signal_type"] == "funding_win"
    assert r2["organization_name_normalized"] == "sagamok-anishnawbek"
