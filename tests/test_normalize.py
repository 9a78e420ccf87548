"""Golden tests ported from the reference's normalize_test.go semantics
(crawler/internal/frontier/normalize_test.go)."""

import pyarrow as pa
import pytest

from north_cloud_ray.frontier.normalize import (
    NormalizeError,
    extract_host,
    extract_host_column,
    host_hash64,
    is_binary_url,
    is_binary_url_mask,
    normalize_url,
    normalize_url_column,
    sha256_hex_column,
    url_hash,
)

CASES = [
    # scheme and host
    ("HTTP://Example.com/Path", "https://example.com/Path"),
    ("https://EXAMPLE.COM/path", "https://example.com/path"),
    ("http://example.com/path", "https://example.com/path"),
    # ports
    ("https://example.com:443/path", "https://example.com/path"),
    ("http://example.com:80/path", "https://example.com/path"),
    ("https://example.com:8080/path", "https://example.com:8080/path"),
    # path
    ("https://example.com/path/", "https://example.com/path"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/news/article-123", "https://example.com/news/article-123"),
    ("https://example.com/a/b/../c", "https://example.com/a/c"),
    ("https://example.com/a/./b", "https://example.com/a/b"),
    # fragment
    ("https://example.com/path#section", "https://example.com/path"),
    # query
    ("https://example.com/path?z=1&a=2", "https://example.com/path?a=2&z=1"),
    ("https://example.com/path?utm_source=twitter&id=1", "https://example.com/path?id=1"),
    ("https://example.com/path?fbclid=abc123&id=1", "https://example.com/path?id=1"),
    ("https://example.com/path?gclid=xyz&page=2", "https://example.com/path?page=2"),
    (
        "https://example.com/?utm_source=a&utm_medium=b&utm_campaign=c"
        "&utm_term=d&utm_content=e&fbclid=f&gclid=g&gclsrc=h&dclid=i&msclkid=j&keep=yes",
        "https://example.com/?keep=yes",
    ),
    ("https://example.com/path?utm_source=x", "https://example.com/path"),
    # extra equivalence checks
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a//b", "https://example.com/a/b"),
]

ERROR_CASES = ["", "://not-a-url", "example.com/path"]


@pytest.mark.parametrize("raw,want", CASES)
def test_normalize_url(raw, want):
    assert normalize_url(raw) == want


@pytest.mark.parametrize("raw", ERROR_CASES)
def test_normalize_url_errors(raw):
    with pytest.raises(NormalizeError):
        normalize_url(raw)


def test_url_hash_equivalent():
    assert url_hash("HTTP://Example.com/path?b=2&a=1") == url_hash(
        "https://example.com/path?a=1&b=2"
    )


def test_url_hash_shape():
    h = url_hash("https://example.com")
    assert len(h) == 64 and all(c in "0123456789abcdef" for c in h)
    assert url_hash("https://example.com/page-a") != url_hash("https://example.com/page-b")


@pytest.mark.parametrize(
    "raw,want",
    [
        ("https://example.com/path", "example.com"),
        ("https://example.com:8080/path", "example.com"),
        ("https://www.example.com/path", "www.example.com"),
        ("https://EXAMPLE.COM/path", "example.com"),
    ],
)
def test_extract_host(raw, want):
    assert extract_host(raw) == want


def test_extract_host_errors():
    for raw in ["", "://bad"]:
        with pytest.raises(NormalizeError):
            extract_host(raw)


def test_binary_url_predicate():
    # fetcher/worker.go:62-77,509-526
    assert is_binary_url("https://example.com/file.pdf")
    assert is_binary_url("https://example.com/SONG.MP3")
    assert is_binary_url("https://example.com/downloadmp3.php?id=1")
    assert is_binary_url("https://example.com/assets/app.js")
    assert not is_binary_url("https://example.com/news/article-123")
    assert not is_binary_url("https://example.com/")


def test_vectorized_matches_scalar():
    raws = [c[0] for c in CASES] + ERROR_CASES
    arr = pa.array(raws, type=pa.string())
    normalized, valid = normalize_url_column(arr)
    for i, raw in enumerate(raws):
        if raw in ERROR_CASES:
            assert not valid[i].as_py()
        else:
            assert valid[i].as_py()
            assert normalized[i].as_py() == normalize_url(raw)


def test_vectorized_hash_and_host():
    urls = [normalize_url(c[0]) for c in CASES]
    arr = pa.array(urls)
    hashes = sha256_hex_column(arr)
    import hashlib

    for u, h in zip(urls, hashes.to_pylist()):
        assert h == hashlib.sha256(u.encode()).hexdigest()
    hosts = extract_host_column(arr)
    for u, h in zip(urls, hosts.to_pylist()):
        assert h == extract_host(u)


def test_vectorized_binary_mask():
    urls = [
        "https://example.com/file.pdf",
        "https://example.com/news/a",
        "https://example.com/downloadmp3.php",
        "https://example.com/x.JPG?w=1",
    ]
    mask = is_binary_url_mask(pa.array(urls)).to_pylist()
    assert mask == [True, False, True, True]


def test_host_hash_stable():
    assert host_hash64("example.com") == host_hash64("example.com")
    assert host_hash64("example.com") != host_hash64("example.org")
    assert 0 <= host_hash64("example.com") < 2**63


def test_should_skip_url_m6():
    from north_cloud_ray.frontier.content_url import (
        should_skip_url,
        should_skip_url_mask,
    )

    cases = {
        "https://example.com/news/a-b-c-d": False,
        "https://example.com/shop/item": True,             # e-commerce segment
        "https://example.com/wp-content/uploads/x": True,  # CDN asset prefix
        "https://example.com/static/app.css": True,
        "https://play.google.com/store/apps": True,        # non-content host
        "https://cdn123.cloudfront.net/x": True,           # host suffix
        "https://example.com/file.pdf": True,              # binary ext
        "https://example.com/login/next": True,            # non-content segment
        "https://example.com/article/x": False,
    }
    for url, want in cases.items():
        assert should_skip_url(url) is want, url
    # off-domain check
    assert should_skip_url("https://other.com/a", source_host="example.com")
    assert not should_skip_url("https://example.com/a-b-c-d", source_host="example.com")
    # vectorized equivalence
    urls = list(cases.keys())
    mask = should_skip_url_mask(pa.array(urls)).to_pylist()
    assert mask == [cases[u] for u in urls]
