"""Property-based tests for URL normalization (hypothesis): idempotence,
equivalence classes, and hash stability."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from north_cloud_ray.frontier.normalize import (
    NormalizeError,
    extract_host,
    normalize_url,
    url_hash,
)

hosts = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,10}[a-z0-9])?(\.[a-z0-9]{1,8}){1,2}",
                      fullmatch=True)
path_seg = st.text(alphabet=string.ascii_letters + string.digits + "-_.",
                   min_size=1, max_size=12).filter(lambda s: s not in (".", ".."))
paths = st.lists(path_seg, max_size=4).map(lambda segs: "/" + "/".join(segs))
qkeys = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
qvals = st.text(alphabet=string.ascii_letters + string.digits, max_size=6)
queries = st.dictionaries(qkeys, qvals, max_size=4)


def _build(scheme, host, path, query, fragment):
    q = "&".join(f"{k}={v}" for k, v in query.items())
    u = f"{scheme}://{host}{path}"
    if q:
        u += "?" + q
    if fragment:
        u += "#frag"
    return u


@given(scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
       host=hosts, path=paths, query=queries, fragment=st.booleans())
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(scheme, host, path, query, fragment):
    u = _build(scheme, host, path, query, fragment)
    n1 = normalize_url(u)
    assert normalize_url(n1) == n1  # fixpoint
    assert n1.startswith("https://")
    assert "#" not in n1
    assert url_hash(u) == url_hash(n1)


@given(host=hosts, path=paths, query=queries)
@settings(max_examples=100, deadline=None)
def test_scheme_and_case_equivalence(host, path, query):
    a = _build("http", host, path, query, False)
    b = _build("https", host.upper(), path, query, True)
    assert url_hash(a) == url_hash(b)
    assert extract_host(a) == extract_host(b) == host.lower()


@given(host=hosts, path=paths,
       tracking=st.sampled_from(["utm_source", "utm_medium", "fbclid",
                                 "gclid", "msclkid"]),
       query=queries)
@settings(max_examples=100, deadline=None)
def test_tracking_params_stripped(host, path, tracking, query):
    base = _build("https", host, path, query, False)
    sep = "&" if query else "?"
    with_tracking = base + f"{sep}{tracking}=xyz"
    assert url_hash(base) == url_hash(with_tracking)


@given(host=hosts, path=paths, query=queries)
@settings(max_examples=100, deadline=None)
def test_query_order_irrelevant(host, path, query):
    items = list(query.items())
    a = _build("https", host, path, dict(items), False)
    b = _build("https", host, path, dict(reversed(items)), False)
    assert url_hash(a) == url_hash(b)


@given(host=hosts, path=paths)
@settings(max_examples=100, deadline=None)
def test_trailing_slash_equivalence(host, path):
    a = f"https://{host}{path}"
    b = a + "/" if not a.endswith("/") else a
    assert url_hash(a) == url_hash(b)


@given(raw=st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_never_crashes_on_garbage(raw):
    try:
        n = normalize_url(raw)
        assert isinstance(n, str)
    except NormalizeError:
        pass  # rejection is the only allowed failure mode
