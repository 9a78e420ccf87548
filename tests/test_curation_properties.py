"""Property-based tests (hypothesis) for the curation / interleaved-span
operators: pure-Python reference semantics must hold for arbitrary inputs.
Ray is deliberately NOT involved — these pin the per-partition kernels;
distributed equivalence is covered by the forced-path tests and the SQL
oracle sweep."""

import re
import string

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from north_cloud_ray.stages.curation import EMAIL_RE, IPV4_RE, PHONE_RE

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
texts = st.lists(words, max_size=12).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(texts, min_size=1, max_size=20))
def test_pii_redact_kernel_counts_match_re(doc_texts):
    """Vectorized pandas str.count/replace == re.findall/re.sub for every
    pattern, including after PII injection."""
    injected = [
        t + f" user{i}@example.com 416-555-{i % 10000:04d} 10.0.{i % 256}.1"
        if i % 2 == 0 else t
        for i, t in enumerate(doc_texts)
    ]
    # exercise the PRODUCTION kernel semantics (re.ASCII — RE2 parity),
    # not a flagless lookalike
    s = pd.Series(injected)
    for pat in (EMAIL_RE, PHONE_RE, IPV4_RE):
        got = s.str.count(pat, flags=re.ASCII).to_numpy()
        want = np.array([len(re.findall(pat, t, flags=re.ASCII))
                         for t in injected])
        assert (got == want).all()
    red = s.str.replace(EMAIL_RE, "<EMAIL>", regex=True, flags=re.ASCII) \
           .str.replace(PHONE_RE, "<PHONE>", regex=True, flags=re.ASCII) \
           .str.replace(IPV4_RE, "<IP>", regex=True, flags=re.ASCII)
    for r in red:
        assert not re.search(EMAIL_RE, r, flags=re.ASCII)
        assert not re.search(PHONE_RE, r, flags=re.ASCII)
        assert not re.search(IPV4_RE, r, flags=re.ASCII)


span_struct = st.tuples(
    st.booleans(),  # is_media
    st.text(alphabet=string.ascii_lowercase + " ", max_size=10),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(span_struct, min_size=1, max_size=6),
                min_size=1, max_size=8))
def test_reassemble_kernel_roundtrip(ray_session, doc_spans):
    """flatten -> per-partition rebuild reproduces arbitrary valid span
    tables exactly (single-partition kernel property)."""
    import pyarrow as pa

    from north_cloud_ray.frontier.schema import SPAN_TYPE
    from north_cloud_ray.sources.f1 import flatten_spans, reassemble_spans

    rows = []
    for i, spans in enumerate(doc_spans):
        built = []
        for off, (is_media, txt) in enumerate(spans):
            built.append({
                "kind": "media" if is_media else "text",
                "text": "" if is_media else (txt or "x"),
                "media_ref": f"media://{i}/{off}" if is_media else "",
                "offset": off,
            })
        rows.append((f"doc{i:04d}", built))
    tbl = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], type=pa.string()),
         pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))],
        names=["doc_id", "spans"])
    flat = flatten_spans(tbl)
    # exercise the rebuild kernel directly on a shuffled single partition
    perm = np.random.RandomState(0).permutation(flat.num_rows)
    shuffled = flat.take(pa.array(perm)).to_pandas()
    # reach the inner kernel through the public API with one partition
    import ray.data

    ds = ray.data.from_pandas(shuffled)
    out = reassemble_spans(ds, num_partitions=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == list(orig["doc_id"])
    for got, want in zip(out["spans"], orig["spans"]):
        assert [dict(d) for d in got] == [dict(d) for d in want]


def test_pii_redact_ascii_only_semantics(ray_session):
    """Non-ASCII digits (Arabic-Indic, fullwidth) must NOT match the
    phone/IP patterns — the production kernel's RE2-parity contract
    (DuckDB's \\d and \\b are ASCII-only)."""
    import ray.data

    from north_cloud_ray.stages.curation import pii_redact

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["call ١٢٣-٤٥٦-٧٨٩٠ now",
                 "call 123-456-7890 now"],
    }))
    out = pii_redact(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_phones"] == 0
    assert "<PHONE>" not in out.loc[0, "text_redacted"]
    assert out.loc[1, "n_phones"] == 1


from hypothesis import HealthCheck


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
    st.sets(st.integers(min_value=0, max_value=12), max_size=8),
)
def test_incremental_dedup_matches_reference(ray_session, fams, prior_fams):
    """Distributed incremental dedup == the obvious sequential reference
    (drop prior shas, then first-per-sha) for arbitrary duplicate
    structure and prior overlap."""
    import hashlib

    import ray.data

    from north_cloud_ray.stages.curation import incremental_dedup
    from north_cloud_ray.stages.dedup import add_text_sha

    texts = [f"family {f} text" for f in fams]
    new = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(fams), dtype=np.int64),
         "text": texts})).repartition(3)
    prior_shas = [hashlib.sha256(f"family {f} text".encode()).hexdigest()
                  for f in sorted(prior_fams)]
    prior = ray.data.from_pandas(
        pd.DataFrame({"text_sha": pd.Series(prior_shas, dtype=str)}))
    got = incremental_dedup(new, prior).to_pandas()
    if len(got) == 0:  # all-dropped: schema-less empty (documented caveat)
        got = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "text_sha": pd.Series(dtype=str)})
    got = got.sort_values("doc_id").reset_index(drop=True)
    # sequential reference
    seen = set(prior_shas)
    want = []
    for i, t in enumerate(texts):
        h = hashlib.sha256(t.encode()).hexdigest()
        if h not in seen:
            seen.add(h)
            want.append((i, h))
    assert list(got["doc_id"]) == [i for i, _ in want]
    assert list(got["text_sha"]) == [h for _, h in want]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.dictionaries(st.integers(0, 20), st.integers(0, 3), max_size=15),
    st.dictionaries(st.integers(0, 20), st.integers(0, 3), max_size=15),
)
def test_snapshot_diff_matches_reference(ray_session, old_map, new_map):
    """snapshot_diff == the obvious dict diff for arbitrary snapshots."""
    import ray.data

    from north_cloud_ray.stages.curation import snapshot_diff

    def snap(m):
        return ray.data.from_pandas(pd.DataFrame({
            "url_hash": [f"u{k}" for k in m],
            "content_hash": [f"h{v}" for v in m.values()],
        })).repartition(2)

    if not old_map and not new_map:
        return
    got = snapshot_diff(snap(old_map), snap(new_map)).to_pandas()
    want = {}
    for k in set(old_map) | set(new_map):
        u = f"u{k}"
        if k not in old_map:
            want[u] = ("added", "", f"h{new_map[k]}")
        elif k not in new_map:
            want[u] = ("removed", f"h{old_map[k]}", "")
        elif old_map[k] != new_map[k]:
            want[u] = ("changed", f"h{old_map[k]}", f"h{new_map[k]}")
    if len(got) == 0:
        assert want == {}
        return
    got_map = {r.url_hash: (r.status, r.old_hash, r.new_hash)
               for r in got.itertuples()}
    assert got_map == want


# ---- distributed == sequential-reference properties (small example
# counts: each example runs real Ray jobs) ----

line_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", ""]),
             max_size=5).map("\n".join),
    min_size=1, max_size=8)


@settings(max_examples=8, deadline=None)
@given(line_texts)
def test_line_dedup_matches_sequential(ray_session, texts):
    import ray.data

    from north_cloud_ray.stages.curation import line_dedup

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = line_dedup(ray.data.from_pandas(df).repartition(3),
                     num_partitions=4).to_pandas()
    if len(got) == 0:
        # all-boilerplate corpus: empty result is schema-less by the
        # documented hash_grouped_agg contract
        got = pd.DataFrame(columns=["doc_id", "text_dedup", "n_lines",
                                    "n_kept"])
    got = got.sort_values("doc_id").reset_index(drop=True)

    seen, want = set(), []
    for i, t in enumerate(texts):
        lines = [ln for ln in t.split("\n") if ln != ""]
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        if kept:
            want.append((i, "\n".join(kept), len(lines), len(kept)))
    assert list(map(tuple, got.to_records(index=False))) == want


span_lists = st.lists(
    st.lists(st.tuples(st.booleans(),
                       st.sampled_from(["r1", "r2", "r3", ""])),
             min_size=1, max_size=6),
    min_size=1, max_size=6)


def _to_f1(doc_spans):
    import pyarrow as pa

    from north_cloud_ray.frontier.schema import SPAN_TYPE

    ids, spans = [], []
    for i, ss in enumerate(doc_spans):
        ids.append(f"d{i:03d}")
        spans.append([
            {"kind": "media" if m else "text",
             "text": "" if m else f"t{i}-{k}",
             "media_ref": (r if m else ""), "offset": k}
            for k, (m, r) in enumerate(ss)])
    return pa.Table.from_arrays(
        [pa.array(ids, type=pa.string()),
         pa.array(spans, type=pa.list_(SPAN_TYPE))],
        names=["doc_id", "spans"])


@settings(max_examples=8, deadline=None)
@given(span_lists)
def test_media_dedup_matches_sequential(ray_session, doc_spans):
    import ray.data

    from north_cloud_ray.sources.f1 import media_dedup

    tbl = _to_f1(doc_spans)
    got = media_dedup(ray.data.from_arrow(tbl).repartition(2),
                      num_partitions=3).to_pandas()
    got_map = {r["doc_id"]: [(d["kind"], d["text"], d["media_ref"],
                              d["offset"]) for d in r["spans"]]
               for _, r in got.iterrows()}

    seen, want = set(), {}
    for row in tbl.to_pylist():
        kept = []
        for s in row["spans"]:
            if s["kind"] == "media" and s["media_ref"]:
                if s["media_ref"] in seen:
                    continue
                seen.add(s["media_ref"])
            kept.append(s)
        if kept:
            want[row["doc_id"]] = [
                (s["kind"], s["text"], s["media_ref"], k)
                for k, s in enumerate(kept)]
    assert got_map == want


@settings(max_examples=8, deadline=None)
@given(span_lists, st.integers(min_value=1, max_value=8))
def test_truncate_spans_matches_sequential(ray_session, doc_spans, budget):
    import ray.data

    from north_cloud_ray.sources.f1 import truncate_spans

    tbl = _to_f1(doc_spans)
    got = truncate_spans(ray.data.from_arrow(tbl).repartition(2),
                         budget=budget, media_tokens=3,
                         num_partitions=3).to_pandas()
    got_map = {r["doc_id"]: [d["offset"] for d in r["spans"]]
               for _, r in got.iterrows()}

    want = {}
    for row in tbl.to_pylist():
        cum, kept = 0, []
        for s in row["spans"]:
            cum += 3 if s["kind"] == "media" else len(s["text"].split())
            if cum <= budget or s["offset"] == 0:
                kept.append(s["offset"])
        want[row["doc_id"]] = kept
    assert got_map == want
