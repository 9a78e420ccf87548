"""Curation-operator tests: forced distributed paths, gate branches, and
determinism properties not covered by the sf0.001 oracle sweep."""

import numpy as np
import pandas as pd
import ray.data

from north_cloud_ray.stages.curation import (
    incremental_dedup,
    pii_redact,
    source_quality_rollup,
    vocab_topk,
)


def _docs(rows):
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)


def test_incremental_dedup_broadcast_equals_distributed(ray_session):
    """The tagged-union exchange (forced via threshold=0) must produce
    byte-identical survivors to the broadcast anti-join."""
    rng = np.random.default_rng(7)
    texts = [f"doc body {i % 40}" for i in range(200)]  # 40 distinct shas
    new = _docs({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    prior_texts = [f"doc body {i}" for i in range(0, 40, 2)]  # evens seen
    from north_cloud_ray.stages.dedup import add_text_sha

    prior = (
        ray.data.from_pandas(pd.DataFrame({"doc_id": np.arange(20),
                                           "text": prior_texts}))
        .map_batches(lambda b: add_text_sha(b), batch_format="pyarrow")
        .map_batches(lambda b: b[["text_sha"]], batch_format="pandas")
    )
    bc = incremental_dedup(new, prior).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = incremental_dedup(new, prior, broadcast_threshold=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, dist)
    # survivors: exactly the odd-residue sha families, min doc_id each
    assert len(bc) == 20
    assert (bc["doc_id"].to_numpy() % 40 % 2 == 1).all()
    assert (bc["doc_id"].to_numpy() < 40).all()  # min-id-wins


def test_incremental_dedup_empty_prior(ray_session):
    """With no prior index, incremental dedup degenerates to exact
    first-per-sha dedup of the new batch."""
    new = _docs({"doc_id": np.arange(10, dtype=np.int64),
                 "text": [f"t {i % 3}" for i in range(10)]})
    prior = ray.data.from_pandas(pd.DataFrame({"text_sha": pd.Series([], dtype=str)}))
    out = incremental_dedup(new, prior).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2]


def test_pii_redact_counts_and_order(ray_session):
    ds = _docs({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [
            "mail a@b.com and c.d+e@f-g.org now",
            "call 416-555-1234 or 555-000-9999 from 10.0.0.1",
            "plain words only",
        ],
    })
    out = pii_redact(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_phones"] == 0
    assert out.loc[1, "n_phones"] == 2 and out.loc[1, "n_ips"] == 1
    assert out.loc[2, ["n_emails", "n_phones", "n_ips"]].sum() == 0
    assert out.loc[0, "text_redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[1, "text_redacted"] == "call <PHONE> or <PHONE> from <IP>"
    assert out.loc[2, "text_redacted"] == "plain words only"


def test_source_quality_rollup_gate_branches(ray_session):
    """One source trips the dup gate, one trips the short-doc gate, one
    passes both."""
    rows = []
    # srcA: 4 docs, all identical -> dup_frac 0.75 -> dropped
    rows += [{"doc_id": i, "source": "srcA",
              "text": "same words repeated here exactly ten tokens long pad pad"}
             for i in range(4)]
    # srcB: 3 distinct but SHORT docs -> mean_words < 10 -> dropped
    rows += [{"doc_id": 10 + i, "source": "srcB", "text": f"tiny doc {i}"}
             for i in range(3)]
    # srcC: 3 distinct long docs -> kept
    rows += [{"doc_id": 20 + i, "source": "srcC",
              "text": " ".join(f"w{i}x{j}" for j in range(12))}
             for i in range(3)]
    out = source_quality_rollup(_docs(rows)).to_pandas() \
        .set_index("source").sort_index()
    assert not out.loc["srcA", "keep"] and out.loc["srcA", "n_unique"] == 1
    assert out.loc["srcA", "dup_frac"] == 0.75
    assert not out.loc["srcB", "keep"] and out.loc["srcB", "mean_words"] == 3.0
    assert bool(out.loc["srcC", "keep"]) and out.loc["srcC", "n_dup_docs"] == 0


def test_vocab_topk_tiebreak_at_boundary(ray_session):
    """Equal-count tokens at the k boundary resolve token-ASC — the same
    total order the SQL oracle declares."""
    ds = _docs({"text": ["b b a a d c", "c d e", "e f"]})
    # counts: a2 b2 c2 d2 e2 f1 -> k=3 must be a,b,c (count desc, token asc)
    out = vocab_topk(ds, k=3)
    assert list(out["token"]) == ["a", "b", "c"]
    assert list(out["n"]) == [2, 2, 2]


def test_vocab_topk_skips_empty_tokens(ray_session):
    ds = _docs({"text": ["a  b", "", None, "a"]})  # double space -> empty split cell
    out = vocab_topk(ds, k=10)
    assert "" not in set(out["token"])
    assert dict(zip(out["token"], out["n"])) == {"a": 2, "b": 1}


def test_snapshot_diff_all_unchanged_is_empty_typed(ray_session):
    from north_cloud_ray.stages.curation import snapshot_diff

    snap = _docs({"url_hash": [f"u{i}" for i in range(20)],
                  "content_hash": [f"h{i}" for i in range(20)]})
    out = snapshot_diff(snap, snap).to_pandas()
    assert len(out) == 0
    # hash_grouped_agg's documented caveat: an entirely-empty result may
    # be schema-less; if columns survive they must be the contract ones
    if len(out.columns):
        assert list(out.columns) == ["url_hash", "status", "old_hash",
                                     "new_hash"]


def test_snapshot_diff_statuses(ray_session):
    from north_cloud_ray.stages.curation import snapshot_diff

    old = _docs({"url_hash": ["a", "b", "c"],
                 "content_hash": ["h1", "h2", "h3"]})
    new = _docs({"url_hash": ["b", "c", "d"],
                 "content_hash": ["h2", "hX", "h4"]})
    out = snapshot_diff(old, new).to_pandas().set_index("url_hash")
    assert out.loc["a", "status"] == "removed" and out.loc["a", "new_hash"] == ""
    assert out.loc["c", "status"] == "changed" and out.loc["c", "new_hash"] == "hX"
    assert out.loc["d", "status"] == "added" and out.loc["d", "old_hash"] == ""
    assert "b" not in out.index  # unchanged rows never surface


def test_quantile_gate_matches_quantile_disc(ray_session):
    import duckdb

    from north_cloud_ray.stages.curation import quantile_gate

    vals = np.concatenate([np.arange(100), np.arange(20)]).astype(np.int64)
    ds = _docs({"doc_id": np.arange(len(vals), dtype=np.int64), "v": vals})
    out = quantile_gate(ds, "v", q=0.25).to_pandas()
    thr = duckdb.sql(
        "SELECT quantile_disc(v, 0.25) FROM (SELECT unnest(?) AS v)",
        params=[vals.tolist()]).fetchone()[0]
    assert set(out["doc_id"]) == set(np.nonzero(vals >= thr)[0])
    # 'le' keeps the complement boundary-inclusively
    lo = quantile_gate(ds, "v", q=0.25, keep="le").to_pandas()
    assert set(lo["doc_id"]) == set(np.nonzero(vals <= thr)[0])


def test_file_roundtrip_dirty_text(ray_session):
    """JSONL and CSV round-trips must survive commas, quotes, newlines
    and unicode in text (writer quoting / reader parsing)."""
    from north_cloud_ray.sources import files as F
    import tempfile, shutil

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ['a,b,"c" d', "line1\nline2", "héllo wörld", ""],
        "lang": ["en", "en", "de", ""],
        "source": ["s1", "s2", "s1", ""],
        "n_chars": np.array([9, 11, 11, 0], dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(2)
    for fmt, (w, r) in {"jsonl": (F.write_jsonl, F.read_jsonl_docs),
                        "csv": (F.write_csv, F.read_csv_docs)}.items():
        out = tempfile.mkdtemp(prefix=f"rt-{fmt}-")
        try:
            w(ds, out)
            back = r(out).to_pandas().sort_values("doc_id") \
                .reset_index(drop=True)
            pd.testing.assert_frame_equal(back, df, check_like=True)
        finally:
            shutil.rmtree(out, ignore_errors=True)


def test_line_dedup_semantics(ray_session):
    """Global first-occurrence line dedup: later copies drop, empty
    lines never participate, docs losing every line vanish, and the
    winner order is (doc_id, line_no) even across partitions."""
    from north_cloud_ray.stages.curation import line_dedup

    ds = _docs({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "alpha\nboiler\n\nbeta",     # doc 0: all lines first-seen
            "boiler\ngamma",             # doc 1: loses boiler
            "boiler",                    # doc 2: loses everything
            "gamma\nalpha\ndelta",       # doc 3: keeps only delta
        ],
    })
    out = (line_dedup(ds, num_partitions=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out["text_dedup"].tolist() == ["alpha\nboiler\nbeta",
                                          "gamma", "delta"]
    assert out["n_lines"].tolist() == [3, 2, 3]  # empty line not counted
    assert out["n_kept"].tolist() == [3, 1, 1]


_BOILER_CORPUS = {
    "doc_id": np.arange(5, dtype=np.int64),
    "source": ["a", "a", "a", "a", "b"],
    "text": [
        "nav\nalpha one\npromo",          # promo in 2/4 docs -> boiler
        "nav\n\nbeta two",                # empty line never counted
        "nav\npromo\ngamma three\nnav",   # within-doc dup: one doc-count,
                                          # BOTH occurrences stripped
        "nav",                            # pure boilerplate -> vanishes
        "nav\ndelta",                     # source b has 1 doc: min_docs=2
                                          # unmet, nav SURVIVES there
    ],
}


def test_boilerplate_strip_semantics(ray_session):
    """Per-source >=half-of-docs lines are stripped from EVERY doc (incl.
    within-doc repeats); the same line in a too-small other source stays;
    pure-boilerplate docs vanish; empty lines don't count."""
    from north_cloud_ray.stages.curation import boilerplate_strip

    out = (boilerplate_strip(_docs(_BOILER_CORPUS), num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 2, 4]
    assert out["text_clean"].tolist() == [
        "alpha one", "beta two", "gamma three", "nav\ndelta"]
    assert out["n_lines"].tolist() == [3, 2, 4, 2]
    assert out["n_removed"].tolist() == [2, 1, 3, 0]


def test_boilerplate_strip_broadcast_equals_distributed(ray_session):
    """threshold=0 forces the tagged-union anti-join path; outputs must
    be identical to the broadcast fast path."""
    from north_cloud_ray.stages.curation import boilerplate_strip

    fast = (boilerplate_strip(_docs(_BOILER_CORPUS), num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (boilerplate_strip(_docs(_BOILER_CORPUS), num_partitions=4,
                              broadcast_threshold=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist[fast.columns])


def test_boilerplate_strip_no_boiler_is_identity(ray_session):
    """A corpus with no qualifying line passes through untouched (and the
    empty broadcast set doesn't crash the probe)."""
    from north_cloud_ray.stages.curation import boilerplate_strip

    ds = _docs({"doc_id": np.arange(3, dtype=np.int64),
                "source": ["a", "a", "b"],
                "text": ["x one\ny two", "z three", "w four"]})
    out = (boilerplate_strip(ds, num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text_clean"].tolist() == ["x one\ny two", "z three",
                                          "w four"]
    assert out["n_removed"].tolist() == [0, 0, 0]


def test_warc_roundtrip_dirty_text(ray_session):
    """WARC export/ingest must survive CRLFs, unicode, and empty text in
    payloads (exact Content-Length framing), and header-unsafe metadata
    must be sanitized rather than desync the parser."""
    import shutil
    import tempfile

    from north_cloud_ray.sources.warc import (read_warc_docs,
                                              read_warc_records,
                                              write_warc)

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["plain words", "with\r\ncrlf and\nlf", "héllo wörld", ""],
        "lang": ["en", "en", "de", ""],
        "source": ["s1", "s\r\n2", "s1", ""],
        "n_chars": np.array([11, 17, 11, 0], dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = tempfile.mkdtemp(prefix="rt-warc-")
    try:
        manifest = write_warc(ds, out).to_pandas()
        assert manifest["n_records"].sum() == 4
        back = read_warc_docs(out).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        want = df.copy()
        want["source"] = ["s1", "s 2", "s1", ""]  # header-sanitized
        pd.testing.assert_frame_equal(back, want, check_like=True)
        recs = read_warc_records(out).to_pandas()
        assert set(recs["warc_type"]) == {"resource"}
        assert recs["target_uri"].str.startswith("urn:nc:doc:").all()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_warc_foreign_record_and_gzip(ray_session):
    """A hand-built foreign WARC member (no NC headers, gzip whole-file)
    parses: payload-hash doc_id fallback, recomputed n_chars."""
    import gzip
    import shutil
    import tempfile

    from north_cloud_ray.sources.warc import read_warc_docs

    body = "external page body"
    payload = body.encode()
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: https://example.com/a\r\n"
           b"Content-Type: text/plain\r\n"
           b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
           + payload + b"\r\n\r\n")
    out = tempfile.mkdtemp(prefix="rt-warcgz-")
    try:
        with open(f"{out}/foreign.warc.gz", "wb") as f:
            f.write(gzip.compress(rec * 2))  # two identical records
        docs = read_warc_docs(out).to_pandas()
        assert len(docs) == 2
        assert (docs["text"] == body).all()
        assert (docs["n_chars"] == len(body)).all()
        assert (docs["doc_id"] >= 0).all()
        assert docs["doc_id"].nunique() == 1  # deterministic hash id
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_warc_responses_no_stem_collision_across_rounds(ray_session):
    """Two blocks with the SAME url_hash set but different crawl
    timestamps (adaptive recrawl rounds) must write distinct members —
    a range-based stem would silently last-writer-replace one round."""
    import shutil
    import tempfile

    from north_cloud_ray.sources.warc import (read_warc_records,
                                              write_warc_responses)

    def block(ts):
        return pd.DataFrame({
            "url": ["https://h/a", "https://h/b"],
            "url_hash": ["aa" * 32, "bb" * 32],
            "host": ["h", "h"],
            "crawled_at": np.array([ts, ts], dtype=np.int64),
            "html": [b"body-a-%d" % ts, b"body-b-%d" % ts],
        })

    ds = ray.data.from_pandas([block(1_000_000), block(2_000_000)])
    out = tempfile.mkdtemp(prefix="warc-rounds-")
    try:
        manifest = write_warc_responses(ds, out).to_pandas()
        assert manifest["n_records"].sum() == 4
        assert manifest["path"].nunique() == 2
        back = read_warc_records(out).to_pandas()
        assert len(back) == 4  # both rounds' records survive
        assert sorted(bytes(p) for p in back["payload"]) == sorted(
            [b"body-a-1000000", b"body-b-1000000",
             b"body-a-2000000", b"body-b-2000000"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_warc_docs_mixed_nc_and_foreign_batch(ray_session):
    """One parse batch mixing NC-exported and foreign records must fall
    back PER ROW: hash doc_ids and '' lang/source for foreign rows, NC
    values preserved for exported rows."""
    import shutil
    import tempfile

    from north_cloud_ray.sources.warc import read_warc_docs, write_warc

    df = pd.DataFrame({
        "doc_id": np.array([7], dtype=np.int64),
        "text": ["exported text"], "lang": ["en"], "source": ["s1"],
        "n_chars": np.array([13], dtype=np.int64),
    })
    out = tempfile.mkdtemp(prefix="warc-mixed-")
    try:
        write_warc(ray.data.from_pandas(df), out)
        foreign = (b"WARC/1.0\r\n"
                   b"WARC-Type: response\r\n"
                   b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                   b"WARC-Target-URI: https://x/y\r\n"
                   b"Content-Length: 7\r\n\r\nforeign\r\n\r\n")
        with open(f"{out}/foreign.warc", "wb") as f:
            f.write(foreign)
        docs = read_warc_docs(out).to_pandas().sort_values("text") \
            .reset_index(drop=True)
        assert len(docs) == 2
        exp = docs[docs["text"] == "exported text"].iloc[0]
        assert (exp["doc_id"], exp["lang"], exp["source"]) == (7, "en", "s1")
        fo = docs[docs["text"] == "foreign"].iloc[0]
        assert fo["lang"] == "" and fo["source"] == ""
        assert fo["doc_id"] >= 0 and fo["n_chars"] == 7
    finally:
        shutil.rmtree(out, ignore_errors=True)
