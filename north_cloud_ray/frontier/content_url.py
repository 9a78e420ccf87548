"""Content-URL heuristic (M7) — drives the spider-article priority bonus.

Re-implements crawler/internal/crawler/content_detector.go:181-283:
a URL is "content" when (no explicit patterns configured):
- path is non-empty, not a binary/non-content path
- single-segment paths qualify only via a >=4-word hyphen slug
- then: date path /YYYY/MM(/DD)?/x, OR a known content segment followed by
  more path, OR any >=4-word hyphen slug segment.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.compute as pc

from .normalize import _BINARY_EXTENSIONS

# content_detector.go:39-61
NON_CONTENT_SEGMENTS = frozenset(
    "login signin signup register search contact about privacy terms tag "
    "category author page feed rss sitemap admin wp-admin account cart "
    "checkout".split()
)

# content_detector.go:133-176
CONTENT_PATH_SEGMENTS = frozenset(
    "article story post news press media newsroom events event calendar "
    "upcoming alert alerts advisory advisories bulletin bulletins blotter "
    "blotters incidents arrests reports report investors investor updates "
    "obituaries obituary obits recipes recipe food jobs careers rfp rfps "
    "tenders tender procurement solicitations solicitation bids".split()
)

MIN_SLUG_WORD_COUNT = 4  # content_detector.go:12

_DATE_PATH_RE = re.compile(r"/\d{4}/\d{2}(/\d{2})?/[^/]+")  # :179


def is_content_url(page_url: str) -> bool:
    try:
        parsed = urlsplit(page_url)
    except ValueError:
        return False
    path = parsed.path.rstrip("/")
    if not path:
        return False
    lower = path.lower()
    segments = path.lstrip("/").split("/")
    lower_segments = lower.lstrip("/").split("/")
    if any(s in NON_CONTENT_SEGMENTS for s in lower_segments):
        return False
    if any(lower.endswith(ext) for ext in _BINARY_EXTENSIONS):
        return False
    if len(segments) == 1 and len(segments[0].split("-")) < MIN_SLUG_WORD_COUNT:
        return False
    if _DATE_PATH_RE.search(path):
        return True
    last = len(segments) - 1
    if any(s in CONTENT_PATH_SEGMENTS and i < last for i, s in enumerate(lower_segments)):
        return True
    return any(len(s.split("-")) >= MIN_SLUG_WORD_COUNT for s in segments)


def is_content_url_mask(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized is_content_url over normalized URLs.

    Built from pyarrow regex kernels; equivalence with the scalar version is
    asserted in tests. Stays zero-copy-ish: five regex passes over the path
    column instead of a Python loop.
    """
    paths = pc.replace_substring_regex(urls, r"^[a-z]+://[^/]*", "")
    paths = pc.replace_substring_regex(paths, r"[?#].*$", "")
    paths = pc.replace_substring_regex(paths, r"/+$", "")
    lower = pc.utf8_lower(paths)

    nonempty = pc.not_equal(paths, "")
    noncontent_pat = r"/(?:" + "|".join(re.escape(s) for s in NON_CONTENT_SEGMENTS) + r")(/|$)"
    bad_seg = pc.match_substring_regex(lower, noncontent_pat)
    binary = pc.match_substring_regex(
        lower, r"(?:" + "|".join(re.escape(e) for e in _BINARY_EXTENSIONS) + r")$"
    )
    # single segment without a long slug
    single_seg = pc.invert(pc.match_substring_regex(paths, r"^/[^/]+/"))
    long_slug = pc.match_substring_regex(paths, r"(^|/)[^/-]*-[^/-]*-[^/-]*-[^/]*(/|$)")
    single_no_slug = pc.and_(single_seg, pc.invert(long_slug))

    date_path = pc.match_substring_regex(paths, r"/\d{4}/\d{2}(/\d{2})?/[^/]+")
    content_seg_pat = (
        r"/(?:" + "|".join(re.escape(s) for s in CONTENT_PATH_SEGMENTS) + r")/."
    )
    content_seg = pc.match_substring_regex(lower, content_seg_pat)

    positive = pc.or_(pc.or_(date_path, content_seg), long_slug)
    ok = pc.and_(pc.and_(nonempty, pc.invert(bad_seg)), pc.invert(binary))
    ok = pc.and_(ok, pc.invert(single_no_slug))
    return pc.and_(ok, positive)


# ---------------- spider URL pre-filter (M6) ----------------
# crawler/internal/crawler/url_filter.go:9-113

ECOMMERCE_SEGMENTS = frozenset("shop store product products cart checkout".split())
CDN_ASSET_PREFIXES = ("/wp-content/uploads/", "/assets/", "/static/")
NON_CONTENT_HOSTS = (
    "play.google.com", "apps.apple.com", "itunes.apple.com",
    ".cloudfront.net", ".googleusercontent.com", ".fbcdn.net", ".twimg.com",
)


def should_skip_url(raw_url: str, source_host: str = "") -> bool:
    """True when the spider should not visit this URL (url_filter.go:38-66):
    off-domain (when source_host given), non-content hosts, binary
    extensions, CDN/asset prefixes, non-content / e-commerce segments."""
    try:
        parsed = urlsplit(raw_url)
    except ValueError:
        return True
    host = (parsed.hostname or "").lower()
    if source_host and host != source_host.lower():
        return True
    for entry in NON_CONTENT_HOSTS:
        if entry.startswith("."):
            if host.endswith(entry):
                return True
        elif host == entry:
            return True
    lower = parsed.path.lower()
    # path.Ext semantics: extension of the last segment only
    last = lower.rsplit("/", 1)[-1]
    if "." in last and ("." + last.rsplit(".", 1)[1]) in _BINARY_EXTENSIONS:
        return True
    if any(lower.startswith(p) for p in CDN_ASSET_PREFIXES):
        return True
    segs = lower.lstrip("/").split("/")
    return any(s in NON_CONTENT_SEGMENTS or s in ECOMMERCE_SEGMENTS for s in segs)


def should_skip_url_mask(urls: pa.Array | pa.ChunkedArray,
                         source_host: str = "") -> pa.Array:
    """Vectorized should_skip_url over normalized URLs."""
    hosts = pc.utf8_lower(
        pc.replace_substring_regex(
            pc.replace_substring_regex(urls, r"^[a-z]+://", ""), r"[/:?#].*$", ""
        )
    )
    paths = pc.utf8_lower(
        pc.replace_substring_regex(
            pc.replace_substring_regex(urls, r"^[a-z]+://[^/]*", ""), r"[?#].*$", ""
        )
    )
    skip = pc.equal(hosts, "___never___")  # all-false seed
    if source_host:
        skip = pc.or_(skip, pc.not_equal(hosts, source_host.lower()))
    for entry in NON_CONTENT_HOSTS:
        if entry.startswith("."):
            skip = pc.or_(skip, pc.ends_with(hosts, pattern=entry))
        else:
            skip = pc.or_(skip, pc.equal(hosts, entry))
    ext_pat = r"(?:" + "|".join(re.escape(e) for e in _BINARY_EXTENSIONS) + r")$"
    skip = pc.or_(skip, pc.match_substring_regex(paths, ext_pat))
    for p in CDN_ASSET_PREFIXES:
        skip = pc.or_(skip, pc.starts_with(paths, pattern=p))
    seg_pat = (
        r"/(?:"
        + "|".join(re.escape(s) for s in sorted(NON_CONTENT_SEGMENTS | ECOMMERCE_SEGMENTS))
        + r")(/|$)"
    )
    skip = pc.or_(skip, pc.match_substring_regex(paths, seg_pat))
    return skip
