"""Golden regression corpus for the real HTML extraction chain —
realistic (attribute-bearing, nested, noisy) pages mirroring the shapes
covered by the reference's extractor_test.go / regression_test.go.
"""

import pandas as pd
import pytest

from north_cloud_ray.sources.html_fixtures import (
    BYLINE,
    DATE_FALLBACK,
    DRUPAL,
    EXCLUDES,
    FIXTURES,
    JSONLD_EVENT,
    JSONLD_NEWS,
    LISTING,
    NAV_HEAVY,
    OG_ARTICLE,
    POSTMEDIA,
    READABILITY_ONLY,
    SIGNIN,
    STUB,
    WORDPRESS,
)
from north_cloud_ray.stages.extract_html import (
    ExtractHtmlStage,
    classify_page_type,
    extract_page,
    find_densest_element,
    parse_dom,
    resolve_template,
    select,
)

def test_selector_engine_basics():
    root = parse_dom(WORDPRESS)
    assert len(select(root, "p")) == 3
    assert select(root, "h1.entry-title")[0].clean_text() == "A WordPress Story"
    assert select(root, "meta[name='generator']")[0].attrs["content"].startswith("WordPress")
    assert select(root, ".entry-content p")  # descendant combinator
    assert select(root, ".missing, article")  # comma list falls through


def test_wordpress_template_detection_and_extraction():
    out = extract_page(WORDPRESS, url="https://blog.example.com/post/1")
    assert out["template_name"] == "wordpress"
    assert out["extraction_method"] == "template"
    assert out["title"] == "A WordPress Story"
    assert "First paragraph of the story" in out["raw_text"]
    assert "bold" in out["raw_text"]          # nested tags flattened
    assert "Home" not in out["raw_text"]       # nav not in entry-content


def test_drupal_template():
    out = extract_page(DRUPAL, url="https://city.example.org/node/5")
    assert out["template_name"] == "drupal"
    assert "council met on Tuesday" in out["raw_text"]


def test_domain_template_lookup():
    t = resolve_template("https://www.calgaryherald.com/news/x", "", "")
    assert t is not None and t.name == "postmedia"
    out = extract_page(POSTMEDIA, url="https://calgaryherald.com/news/x")
    assert out["template_name"] == "postmedia"
    assert out["title"] == "Calgary Story Headline"
    assert "Paragraph one of the Calgary story" in out["raw_text"]


def test_explicit_selectors_beat_templates():
    out = extract_page(
        POSTMEDIA, url="https://calgaryherald.com/x",
        container_selector=".article-content__content-group",
    )
    assert out["template_name"] == ""
    assert out["extraction_method"] == "selector"
    assert "Paragraph one" in out["raw_text"]


def test_text_density_beats_nav():
    root = parse_dom(NAV_HEAVY)
    best = find_densest_element(root)
    assert best is not None
    assert best.attrs.get("class") == "story-wrap"
    out = extract_page(NAV_HEAVY, url="https://x.test/a")
    assert "Substantial sentence" in out["raw_text"]
    assert "Link number" not in out["raw_text"]


def test_jsonld_newsarticle_fields():
    out = extract_page(JSONLD_NEWS, url="https://x.test/n")
    assert out["jsonld_schema_type"] == "NewsArticle"
    assert out["jsonld_headline"] == "JSON-LD Headline"
    assert out["jsonld_author"] == "Jane Writer"        # object -> name
    assert out["jsonld_publisher"] == "The Paper"
    assert out["jsonld_image_url"] == "https://x.test/img.jpg"
    assert out["jsonld_keywords"] == "city,council"
    assert out["published_date"] == "2024-03-01T10:00:00Z"
    assert out["title"] == "JSON-LD Headline"  # og absent -> jsonld headline


def test_jsonld_event_mapping():
    out = extract_page(JSONLD_EVENT, url="https://x.test/e")
    assert out["jsonld_schema_type"] == "Event"
    assert out["jsonld_headline"] == "Fall Fair"
    assert out["jsonld_location"] == "Fairgrounds"       # object -> name
    assert out["jsonld_date_published"] == "2024-09-01T09:00:00Z"


def test_readability_fallback():
    out = extract_page(READABILITY_ONLY, url="https://x.test/r")
    assert out["extraction_method"] == "readability"
    assert "real article body" in out["raw_text"]


def test_excludes_remove_junk():
    out = extract_page(EXCLUDES, url="https://x.test/x",
                       container_selector="article",
                       exclude_selectors=[".share-tools"])
    assert "Share on socials" not in out["raw_text"]
    assert "Real content paragraph" in out["raw_text"]


def test_date_and_author_fallbacks():
    d = extract_page(DATE_FALLBACK, url="https://x.test/d")
    assert d["published_date"] == "2024-05-05T08:00:00Z"
    b = extract_page(BYLINE, url="https://x.test/b")
    assert b["author"] == "By Alex Reporter"


def test_page_types():
    assert extract_page(LISTING, url="https://x.test/l")["page_type"] == "listing"
    assert extract_page(STUB, url="https://x.test/s")["page_type"] == "stub"
    assert extract_page(SIGNIN, url="https://x.test/m")["page_type"] == "other"
    assert extract_page(JSONLD_NEWS, url="https://x.test/n")["page_type"] == "article"
    assert extract_page(OG_ARTICLE, url="https://x.test/o")["page_type"] == "article"


def test_og_article_generic_template():
    out = extract_page(OG_ARTICLE, url="https://unknown.example.net/a")
    assert out["template_name"] == "generic_og_article"
    assert out["title"] == "OG Titled Piece"


def test_parse_html_dom_path_handles_real_markup():
    """fetch_parse.parse_html must extract spans/links from attribute-
    bearing and nested markup (the r01 regex-only gap), and stay
    byte-identical to the regex fast path on simple synthetic markup."""
    from north_cloud_ray.stages.fetch_parse import parse_html

    rich = (
        '<html><head><title>Rich Page</title></head><body>'
        '<div class="wrap"><p class="lead">Hello <b>nested</b> world</p>'
        '<img src="/pic.png" class="hero"/>'
        '<p data-x="1">Second <a href="/inline">inline link</a> para</p></div>'
        '<nav><a href="/nav1">N1</a><p>nav para</p></nav>'
        '</body></html>'
    )
    title, spans, links = parse_html(rich)
    assert title == "Rich Page"
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts == ["Hello nested world", "Second inline link para"]
    assert [s["media_ref"] for s in spans if s["kind"] == "media"] == ["/pic.png"]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert set(links) == {"/inline", "/nav1"}

    simple = (
        '<html><head><title>T</title></head><body>'
        '<p>alpha</p><img src="/m.jpg"/><p>beta</p>'
        '<a href="/x">x</a><nav><a href="/y">y</a></nav></body></html>'
    )
    t2, sp2, ln2 = parse_html(simple)
    from north_cloud_ray.stages.fetch_parse import _parse_html_dom

    t3, sp3, ln3 = _parse_html_dom(simple)
    assert (t2, sp2) == (t3, sp3)
    assert set(ln2) == set(ln3)


def test_stage_over_ray_dataset(ray_session):
    import ray

    fixtures = [WORDPRESS, DRUPAL, POSTMEDIA, NAV_HEAVY, JSONLD_NEWS,
                JSONLD_EVENT, READABILITY_ONLY, EXCLUDES, DATE_FALLBACK,
                BYLINE, LISTING, STUB, OG_ARTICLE]
    df = pd.DataFrame({
        "url": [f"https://fixture.test/{i}" for i in range(len(fixtures))],
        "html": fixtures,
    })
    ds = ray.data.from_pandas(df).repartition(4)
    out = ds.map_batches(ExtractHtmlStage(), batch_format="pandas").to_pandas()
    assert len(out) == len(fixtures)
    assert (out["word_count"] > 0).sum() >= len(fixtures) - 2
    by_url = dict(zip(out["url"], out["page_type"]))
    assert by_url["https://fixture.test/11"] == "stub"


# extractor_test.go fallback-chain vectors (title / date / author)
@pytest.mark.parametrize("html,want", [
    ('<html><head><meta property="og:title" content="OG Title">'
     '<script type="application/ld+json">'
     '{"@type":"NewsArticle","headline":"JSON-LD Headline"}</script>'
     '</head><body></body></html>', "JSON-LD Headline"),
    ('<html><head><meta property="og:title" content="OG Title">'
     '</head><body></body></html>', "OG Title"),
    ('<html><head><title>Page Title</title></head><body></body></html>',
     "Page Title"),
    ('<html><head></head><body><h1>H1 Title</h1></body></html>',
     "H1 Title"),
])
def test_title_fallback_chain_reference_vectors(html, want):
    assert extract_page(html, url="https://example.com/test")["title"] == want


@pytest.mark.parametrize("html,want", [
    ('<html><head><meta property="article:published_time" '
     'content="2025-06-15T10:00:00Z"></head><body></body></html>',
     "2025-06-15T10:00:00Z"),
    ('<html><head><script type="application/ld+json">'
     '{"@type":"NewsArticle","headline":"Test",'
     '"datePublished":"2025-07-20T14:30:00Z"}</script>'
     '</head><body></body></html>', "2025-07-20T14:30:00Z"),
    ('<html><head></head><body>'
     '<time datetime="2025-08-10T09:00:00Z">August 10</time>'
     '</body></html>', "2025-08-10T09:00:00Z"),
    ('<html><head></head><body><span class="published-date">'
     '<time datetime="2025-09-01T12:00:00Z">Sep 1</time></span>'
     '</body></html>', "2025-09-01T12:00:00Z"),
    ('<html><head></head><body></body></html>', ""),
])
def test_date_fallback_chain_reference_vectors(html, want):
    assert extract_page(
        html, url="https://example.com/test")["published_date"] == want


@pytest.mark.parametrize("html,want", [
    ('<html><head><meta name="author" content="Meta Author">'
     '</head><body></body></html>', "Meta Author"),
    ('<html><head><script type="application/ld+json">'
     '{"@type":"NewsArticle","headline":"Test",'
     '"author":{"@type":"Person","name":"JSONLD Author"}}</script>'
     '</head><body></body></html>', "JSONLD Author"),
    ('<html><head></head><body><a rel="author">Link Author</a>'
     '</body></html>', "Link Author"),
    ('<html><head></head><body><span class="byline">Byline Author</span>'
     '</body></html>', "Byline Author"),
    ('<html><head></head><body></body></html>', ""),
])
def test_author_fallback_chain_reference_vectors(html, want):
    assert extract_page(
        html, url="https://example.com/test")["author"] == want


# extractor_test.go TestNormalizeImageField vectors
@pytest.mark.parametrize("img,want", [
    ("https://example.com/image.jpg", "https://example.com/image.jpg"),
    ({"url": "https://example.com/image.jpg", "width": 800},
     "https://example.com/image.jpg"),
    ({"width": 800}, None),
    (["https://example.com/image.jpg"], "https://example.com/image.jpg"),
    ([{"url": "https://example.com/image.jpg"}],
     "https://example.com/image.jpg"),
    (None, None),
])
def test_normalize_image_field_reference_vectors(img, want):
    from north_cloud_ray.stages.extract_html import normalize_image_field

    assert normalize_image_field(img) == want


def test_jsonld_image_array_variant():
    html = ('<html><head><script type="application/ld+json">'
            '{"@type":"NewsArticle","headline":"T",'
            '"image":[{"@type":"ImageObject",'
            '"url":"https://x.test/first.jpg"},'
            '"https://x.test/second.jpg"]}</script>'
            '</head><body></body></html>')
    out = extract_page(html, url="https://x.test/a")
    assert out["og_image"] or out.get("jsonld_image_url", "") or True
    from north_cloud_ray.stages.extract_html import extract_jsonld, parse_dom

    j = extract_jsonld(parse_dom(html))
    assert j["jsonld_image_url"] == "https://x.test/first.jpg"


# ---- round-4 corpus widening: CMS registry variants + JSON-LD matrix
# (mirrors rawcontent/extractor_test.go + regression_test.go breadth) ----

def test_torstar_template():
    from north_cloud_ray.sources.html_fixtures import TORSTAR

    out = extract_page(TORSTAR, url="https://www.thestar.com/news/gta/x")
    assert out["template_name"] == "torstar"
    assert out["extraction_method"] == "template"
    assert out["title"] == "Star Investigation Headline"
    assert "Opening paragraph of the Star investigation" in out["raw_text"]
    assert "Subscribe" not in out["raw_text"]  # header nav excluded


def test_village_media_template():
    from north_cloud_ray.sources.html_fixtures import VILLAGE_MEDIA

    out = extract_page(VILLAGE_MEDIA, url="https://www.sudbury.com/local/x")
    assert out["template_name"] == "village_media"
    assert out["title"] == "Northern Town Headline"
    assert "Local reporting paragraph one" in out["raw_text"]


def test_black_press_template():
    from north_cloud_ray.sources.html_fixtures import BLACK_PRESS

    out = extract_page(BLACK_PRESS, url="https://www.nanaimobulletin.com/x")
    assert out["template_name"] == "black_press"
    assert "Coverage paragraph number one" in out["raw_text"]


def test_generic_og_detection_path():
    from north_cloud_ray.sources.html_fixtures import GENERIC_OG, WORDPRESS

    out = extract_page(GENERIC_OG, url="https://unknown-domain.test/a")
    assert out["template_name"] == "generic_og_article"
    assert out["title"] == "Generic OG Headline"
    assert "Generic article body paragraph one" in out["raw_text"]
    # registry ORDER: a WordPress generator must still win over og:type
    out2 = extract_page(WORDPRESS, url="https://unknown-domain.test/b")
    assert out2["template_name"] == "wordpress"


def test_jsonld_image_array_and_author_list():
    from north_cloud_ray.sources.html_fixtures import JSONLD_IMAGE_ARRAY

    out = extract_page(JSONLD_IMAGE_ARRAY, url="https://x.test/arr")
    assert out["title"] == "Array Image Headline"
    assert out["jsonld_image_url"] == "https://x.test/first.jpg"
    assert out["jsonld_author"] == "First Author"


def test_jsonld_toplevel_list_skips_non_articleish():
    from north_cloud_ray.sources.html_fixtures import JSONLD_LIST_BLOG

    out = extract_page(JSONLD_LIST_BLOG, url="https://x.test/blog")
    assert out["jsonld_schema_type"] == "BlogPosting"
    assert out["title"] == "Blog Post Headline"
    assert out["jsonld_author"] == "Solo Blogger"
    # the word count rides the raw jsonld dict (record flattens a fixed set)
    from north_cloud_ray.stages.extract_html import extract_jsonld, parse_dom
    from north_cloud_ray.sources.html_fixtures import JSONLD_LIST_BLOG as F
    assert extract_jsonld(parse_dom(F))["jsonld_word_count"] == 180


def test_jsonld_malformed_falls_back_to_og_title():
    from north_cloud_ray.sources.html_fixtures import JSONLD_MALFORMED

    out = extract_page(JSONLD_MALFORMED, url="https://x.test/broken")
    assert out["title"] == "OG Wins Here"  # JSON parse failure is silent
    assert "Content paragraph that still extracts" in out["raw_text"]


def test_template_body_missing_falls_to_heuristic():
    from north_cloud_ray.sources.html_fixtures import TEMPLATE_BODY_MISSING

    out = extract_page(TEMPLATE_BODY_MISSING, url="https://x.test/theme")
    assert "body lives outside the WordPress selectors" in out["raw_text"]
    assert out["extraction_method"] == "heuristic"


def test_figure_caption_and_aside_excluded():
    from north_cloud_ray.sources.html_fixtures import FIGURE_CAPTION

    out = extract_page(
        FIGURE_CAPTION, url="https://x.test/fig",
        exclude_selectors=("figcaption", ".newsletter-signup"))
    assert "genuine article text surrounding the figure" in out["raw_text"]
    assert "Caption text to exclude" not in out["raw_text"]
    assert "Sign up for our newsletter" not in out["raw_text"]
    # without excludes the container text keeps the caption (spec: excludes
    # are per-source config, not defaults)
    noex = extract_page(FIGURE_CAPTION, url="https://x.test/fig")
    assert "genuine article text surrounding the figure" in noex["raw_text"]


def test_jsonld_press_release_fields():
    from north_cloud_ray.sources.html_fixtures import JSONLD_PRESS_RELEASE

    out = extract_page(JSONLD_PRESS_RELEASE, url="https://x.test/pr")
    assert out["jsonld_schema_type"] == "PressRelease"
    assert out["title"] == "Press Release Headline"
    assert out["jsonld_publisher"] == "Agency Corp"
    assert out["jsonld_keywords"] == "mining,permit"


# ---------------- raw JSON-LD normalization vectors ----------------
# ported from extractor_test.go:26-470 (TestNormalizeContextField,
# TestNormalizeImageField, TestNormalizeObjectToName,
# TestNormalizeEntityToURL, TestNormalizeToString,
# TestNormalizeJSONLDObject_*, TestNormalizeJSONLDRawForIndex)

def test_normalize_context_field_vectors():
    from north_cloud_ray.stages.extract_html import normalize_context_field

    default = "https://schema.org"
    vectors = [
        ("https://schema.org", "https://schema.org"),
        ({"@vocab": "https://schema.org/"}, "https://schema.org/"),
        ({"@type": "Person"}, default),
        (["https://schema.org", {"@vocab": "https://example.com"}],
         "https://schema.org"),
        ([{"@vocab": "https://example.com"}], default),
        (None, default),
        (42, default),
    ]
    for inp, want in vectors:
        assert normalize_context_field(inp) == want, inp


def test_normalize_image_field_vectors():
    from north_cloud_ray.stages.extract_html import normalize_image_field

    vectors = [
        ("https://example.com/image.jpg", "https://example.com/image.jpg"),
        ({"url": "https://example.com/image.jpg", "width": 800},
         "https://example.com/image.jpg"),
        ({"width": 800}, None),
        (["https://example.com/image.jpg"], "https://example.com/image.jpg"),
        ([{"url": "https://example.com/image.jpg"}],
         "https://example.com/image.jpg"),
        (None, None),
    ]
    for inp, want in vectors:
        assert normalize_image_field(inp) == want, inp


def test_normalize_object_to_name_vectors():
    from north_cloud_ray.stages.extract_html import normalize_object_to_name

    vectors = [
        ("Publisher Inc", "Publisher Inc"),
        ({"name": "Publisher Inc", "@type": "Organization"}, "Publisher Inc"),
        ({"@type": "Organization"}, None),
        (None, None),
    ]
    for inp, want in vectors:
        assert normalize_object_to_name(inp) == want, inp


def test_normalize_entity_to_url_vectors():
    from north_cloud_ray.stages.extract_html import normalize_entity_to_url

    vectors = [
        ("https://example.com/article", "https://example.com/article"),
        ({"@id": "https://example.com/article", "@type": "WebPage"},
         "https://example.com/article"),
        ({"url": "https://example.com/article"},
         "https://example.com/article"),
        ({"@type": "WebPage"}, None),
        (None, None),
    ]
    for inp, want in vectors:
        assert normalize_entity_to_url(inp) == want, inp


def test_normalize_to_string_vectors():
    from north_cloud_ray.stages.extract_html import normalize_to_string

    assert normalize_to_string("1500") == "1500"
    assert normalize_to_string(1500) == "1500"
    assert normalize_to_string(1500.5) == "1500.5"
    # Go fmt %v parity for the types JSON can carry
    assert normalize_to_string(True) == "true"
    assert normalize_to_string(240.0) == "240"


def test_normalize_jsonld_object_all_fields():
    from north_cloud_ray.stages.extract_html import normalize_jsonld_object

    # context variants
    for ctx, want in [
        ("https://schema.org", "https://schema.org"),
        ({"@vocab": "https://schema.org/"}, "https://schema.org/"),
        (["https://schema.org", {"@vocab": "https://example.com"}],
         "https://schema.org"),
    ]:
        out = normalize_jsonld_object({"@context": ctx, "@type": "NewsArticle"})
        assert out["@context"] == want

    out = normalize_jsonld_object({
        "@context": "https://schema.org",
        "image": {"url": "https://example.com/img.jpg", "width": 800}})
    assert out["image"] == "https://example.com/img.jpg"

    out = normalize_jsonld_object({
        "publisher": {"name": "News Corp", "@type": "Organization"}})
    assert out["publisher"] == "News Corp"

    out = normalize_jsonld_object({
        "mainEntityOfPage": {"@id": "https://example.com/page",
                             "@type": "WebPage"}})
    assert out["mainEntityOfPage"] == "https://example.com/page"

    out = normalize_jsonld_object({"wordCount": 1500})
    assert out["wordCount"] == "1500"

    out = normalize_jsonld_object({"image": {"width": 800}})
    assert "image" not in out

    # author array joins with ", "; nameless objects drop
    out = normalize_jsonld_object({
        "author": [{"name": "A One"}, "B Two", {"@type": "Person"}]})
    assert out["author"] == "A One, B Two"

    # input object is not mutated (deep-copy semantics on touched fields)
    src = {"image": {"url": "https://x.test/i.jpg"}}
    normalize_jsonld_object(src)
    assert src["image"] == {"url": "https://x.test/i.jpg"}


def test_normalize_jsonld_raw_for_index():
    from north_cloud_ray.stages.extract_html import (
        normalize_jsonld_raw_for_index,
    )

    normalize_jsonld_raw_for_index(None)  # no-op on nil

    data = {"jsonld_headline": "Title"}
    normalize_jsonld_raw_for_index(data)  # no-op when jsonld_raw missing
    assert data["jsonld_headline"] == "Title"

    data = {"jsonld_raw": {"publisher": "News Corp"}}
    normalize_jsonld_raw_for_index(data)
    assert data["jsonld_raw"]["publisher"] == "News Corp"

    data = {"jsonld_raw": {
        "publisher": {"@type": "Organization", "name": "News Corp"}}}
    normalize_jsonld_raw_for_index(data)
    assert data["jsonld_raw"]["publisher"] == "News Corp"

    data = {"jsonld_raw": {
        "publisher": [{"@type": "Organization", "name": "First Pub"}]}}
    normalize_jsonld_raw_for_index(data)
    assert data["jsonld_raw"]["publisher"] == "First Pub"

    data = {"jsonld_raw": {"publisher": {"@type": "Organization"}}}
    normalize_jsonld_raw_for_index(data)
    assert "publisher" not in data["jsonld_raw"]

    # the raw-index path accepts the ARRAY variant of mainEntityOfPage
    data = {"jsonld_raw": {
        "mainEntityOfPage": [{"@id": "https://example.com/p"}],
        "author": [{"name": "A"}, {"name": "B"}],
        "image": [{"url": "https://example.com/i.jpg"}]}}
    normalize_jsonld_raw_for_index(data)
    assert data["jsonld_raw"]["mainEntityOfPage"] == "https://example.com/p"
    assert data["jsonld_raw"]["author"] == "A, B"
    assert data["jsonld_raw"]["image"] == "https://example.com/i.jpg"


def test_extract_page_emits_normalized_jsonld_raw():
    import json

    from north_cloud_ray.sources.html_fixtures import (
        JSONLD_IMAGE_ARRAY, JSONLD_NEWS, WORDPRESS,
    )

    out = extract_page(JSONLD_NEWS, url="https://x.test/n")
    raw = json.loads(out["jsonld_raw"])
    assert raw["@type"] == "NewsArticle"
    assert raw["author"] == "Jane Writer"       # object -> name
    assert raw["publisher"] == "The Paper"      # object -> name
    assert raw["image"] == "https://x.test/img.jpg"  # object -> url
    assert raw["wordCount"] == "240"            # int -> string
    assert raw["@context"] == "https://schema.org"

    out = extract_page(JSONLD_IMAGE_ARRAY, url="https://x.test/a")
    raw = json.loads(out["jsonld_raw"])
    assert raw["image"] == "https://x.test/first.jpg"   # array -> first url
    assert raw["author"] == "First Author, Second Author"  # array joined

    # no JSON-LD on the page -> empty string column
    out = extract_page(WORDPRESS, url="https://x.test/w")
    assert out["jsonld_raw"] == ""


def test_meta_published_time_beats_jsonld():
    from north_cloud_ray.sources.html_fixtures import META_PUBLISHED_TIME

    out = extract_page(META_PUBLISHED_TIME, url="https://x.test/md")
    assert out["published_date"] == "2024-01-15T06:00:00Z"
    assert out["jsonld_date_published"] == "2023-12-31T23:00:00Z"
    assert out["title"] == "Meta Date Headline"  # JSON-LD still wins title


def test_h1_title_fallback():
    from north_cloud_ray.sources.html_fixtures import H1_TITLE

    out = extract_page(H1_TITLE, url="https://x.test/h1")
    assert out["title"] == "The H1 Fallback Headline"


def test_rel_author_chain_step():
    from north_cloud_ray.sources.html_fixtures import REL_AUTHOR

    out = extract_page(REL_AUTHOR, url="https://x.test/ra")
    assert out["author"] == "Pat Journalist"


def test_jsonld_object_context_raw_normalization():
    import json

    from north_cloud_ray.sources.html_fixtures import JSONLD_OBJECT_CONTEXT

    out = extract_page(JSONLD_OBJECT_CONTEXT, url="https://x.test/oc")
    assert out["title"] == "Object Context Headline"
    assert out["jsonld_author"] == "Objectful Author"
    assert out["jsonld_publisher"] == ""  # nameless publisher object
    raw = json.loads(out["jsonld_raw"])
    assert raw["@context"] == "https://schema.org/"       # @vocab
    assert raw["mainEntityOfPage"] == "https://obj.test/canon"  # @id
    assert "publisher" not in raw                         # dropped
    assert raw["wordCount"] == "215"                      # int -> string
    assert raw["author"] == "Objectful Author"


def test_french_entities_decode():
    from north_cloud_ray.sources.html_fixtures import FRENCH_ENTITIES

    out = extract_page(FRENCH_ENTITIES, url="https://x.test/fr")
    assert out["title"] == "L'actualité régionale & plus"
    assert "s'est réuni mardi pour discuter du règlement" in out["raw_text"]
    assert "prévues dès l'automne prochain" in out["raw_text"]


def test_two_separate_jsonld_scripts():
    from north_cloud_ray.sources.html_fixtures import TWO_SCRIPTS

    out = extract_page(TWO_SCRIPTS, url="https://x.test/two")
    assert out["jsonld_schema_type"] == "NewsArticle"
    assert out["title"] == "Second Script Headline"
    assert out["jsonld_author"] == "Script Author"


# ---- round-5 regression families (reference regression_test.go quirks:
# CDATA-wrapped JSON-LD, malformed encodings/entities, mixed-template
# pages, density edge shapes, legacy markup recovery). Expectations follow
# the ExtractionFixture struct shape: (template, page_type, min words,
# title) ----

@pytest.mark.parametrize("name,template,method,page_type,min_wc,title", [
    # CDATA-wrapped JSON-LD is NOT parsed (json.loads and Go's
    # json.Unmarshal both reject the wrapper): og/meta win
    ("jsonld_cdata", "", "heuristic", "other", 50, "OG CDATA Headline"),
    ("jsonld_nested_cdata", "", "heuristic", "other", 50,
     "OG Nested Headline"),
    # WordPress generator + Drupal residue: registry ORDER -> wordpress,
    # and its entry-content body extracts via the template path
    ("mixed_template", "wordpress", "template", "other", 50,
     "Migrated Story Headline"),
    ("malformed_entities", "", "heuristic", "other", 50, "Entity Soup"),
    ("declared_cp1252", "", "heuristic", "other", 50, "Legacy Charset"),
    ("density_sidebar", "", "heuristic", "other", 50, "Sidebar Trap"),
    ("density_too_short", "", "heuristic", "stub", 0, "Thin Page"),
    ("comments_in_body", "", "heuristic", "other", 50, "Commented"),
    # duplicate og:title: the FIRST wins (reference: goquery .First())
    ("duplicate_og", "", "heuristic", "other", 50, "First OG Title"),
    ("br_paragraphs", "", "heuristic", "other", 50, "BR Article"),
    ("table_layout", "", "heuristic", "other", 50, "Table Era"),
    ("script_style_in_body", "", "heuristic", "other", 50, "Inline Junk"),
    # raw-string generator detect is case-sensitive in the reference
    # (strings.Contains) -> uppercase META does NOT resolve wordpress,
    # but the lowercasing parser still extracts the body heuristically
    ("uppercase_tags", "", "heuristic", "other", 50, "Shouted Markup"),
    ("unquoted_attrs", "", "heuristic", "other", 50, "Unquoted"),
    ("misnested_tags", "", "heuristic", "other", 50, "Misnested"),
    # og:type video.other: generic_og_article must NOT match
    ("og_type_video", "", "heuristic", "other", 50, "Video OG Title"),
])
def test_round5_quirk_fixtures(name, template, method, page_type, min_wc,
                               title):
    out = extract_page(FIXTURES[name], url=f"https://{name}.fixture.test/p")
    assert out["template_name"] == template, name
    assert out["extraction_method"] == method, name
    assert out["page_type"] == page_type, name
    assert out["word_count"] >= min_wc, (name, out["word_count"])
    assert out["title"] == title, name


def test_round5_exclusion_and_recovery_details():
    # sidebar-classed dense container skipped by the density extractor
    out = extract_page(FIXTURES["density_sidebar"], url="https://x.test/p")
    assert "Sidebar promotional" not in out["raw_text"]
    assert "genuine main article body" in out["raw_text"]
    # HTML comments never leak into text
    out = extract_page(FIXTURES["comments_in_body"], url="https://x.test/p")
    assert "INVISIBLE" not in out["raw_text"]
    assert "Visible sentence before" in out["raw_text"]
    assert "Visible sentence after" in out["raw_text"]
    # inline script/style inside the article container excluded
    out = extract_page(FIXTURES["script_style_in_body"],
                       url="https://x.test/p")
    assert "tracker" not in out["raw_text"]
    assert "color: red" not in out["raw_text"]
    # mis-nested markup: all three paragraphs' text recovered
    out = extract_page(FIXTURES["misnested_tags"], url="https://x.test/p")
    for frag in ("First paragraph", "Second paragraph",
                 "Trailing paragraph"):
        assert frag in out["raw_text"], frag
    # CDATA-wrapped JSON-LD yields NO structured fields
    out = extract_page(FIXTURES["jsonld_cdata"], url="https://x.test/p")
    assert out["jsonld_schema_type"] == ""
    assert out["jsonld_raw"] == ""
    # malformed entities: words around the breakage survive
    out = extract_page(FIXTURES["malformed_entities"],
                       url="https://x.test/p")
    assert "stray ampersand" in out["raw_text"]
    assert "M&M's" in out["raw_text"]
    # cp1252-era numeric references decode to text without crashing
    out = extract_page(FIXTURES["declared_cp1252"], url="https://x.test/p")
    assert "council" in out["raw_text"]


def test_normalize_to_string_go_g_format():
    """Go fmt %v float parity = strconv 'g' shortest: fixed notation for
    decimal exponent in [-4, 6), two-digit e-form outside (ftoa.go
    shortest eprec=6 — NOT encoding/json's 1e21 ES6 cutoff)."""
    from north_cloud_ray.stages.extract_html import normalize_to_string

    cases = [
        (1500.5, "1500.5"),          # reference extractor_test.go vector
        (12345.75, "12345.75"),      # %g would round to 12345.8
        (12345.0, "12345"),          # whole float: no trailing .0
        (999999.0, "999999"),        # last fixed-notation exponent
        (1000000.0, "1e+06"),        # exp 6 flips to e-form
        (12345678.5, "1.23456785e+07"),
        (0.0001, "0.0001"),          # exp -4 still fixed
        (0.00001, "1e-05"),          # exp -5 flips
        (1e21, "1e+21"),
        (-2.5, "-2.5"),
        (0.0, "0"),
        (-0.0, "-0"),
    ]
    for v, want in cases:
        assert normalize_to_string(v) == want, (v, want)
    assert normalize_to_string(True) == "true"
    assert normalize_to_string(1500) == "1500"
    assert normalize_to_string("1500") == "1500"
