"""F1 input-shape operators: synthesis, flatten, stats, span invariant."""

import pyarrow as pa
import ray.data as rd

from north_cloud_ray.frontier.schema import SPAN_TYPE
from north_cloud_ray.sources.f1 import (
    flatten_spans,
    media_refs,
    span_stats,
    synthesize_f1,
    validate_span_order,
)


def test_synthesize_shape_and_determinism():
    t1 = synthesize_f1(n_hosts=4, max_docs=50)
    t2 = synthesize_f1(n_hosts=4, max_docs=50)
    assert t1.schema.field("doc_id").type == pa.string()
    assert t1.schema.field("spans").type == pa.list_(SPAN_TYPE)
    assert t1.equals(t2)
    assert 0 < t1.num_rows <= 50


def test_flatten_matches_python():
    t = synthesize_f1(n_hosts=2, max_docs=20)
    flat = flatten_spans(t)
    rows = t.to_pylist()
    expect = sum(len(r["spans"]) for r in rows)
    assert flat.num_rows == expect
    # spot check first doc
    first = rows[0]
    got = flat.filter(pa.compute.equal(flat["doc_id"], first["doc_id"])).to_pylist()
    assert [
        {"kind": g["kind"], "text": g["text"], "media_ref": g["media_ref"],
         "offset": g["offset"], "doc_id": g["doc_id"]}
        for g in got
    ] == [{**s, "doc_id": first["doc_id"]} for s in first["spans"]]


def test_span_stats_vectorized_vs_python():
    t = synthesize_f1(n_hosts=3, max_docs=40)
    stats = span_stats(t).to_pylist()
    for row, st in zip(t.to_pylist(), stats):
        spans = row["spans"]
        assert st["n_spans"] == len(spans)
        assert st["n_media"] == sum(1 for s in spans if s["kind"] == "media")
        assert st["n_text"] == st["n_spans"] - st["n_media"]
        assert st["total_text_chars"] == sum(len(s["text"]) for s in spans)


def test_validate_span_order():
    t = synthesize_f1(n_hosts=2, max_docs=20)
    v = validate_span_order(t)
    assert all(v["spans_valid"].to_pylist())  # generator output is valid
    # corrupt one doc: swap offsets
    rows = t.to_pylist()
    rows[0]["spans"][0]["offset"] = 5
    bad = pa.Table.from_arrays(
        [pa.array([r["doc_id"] for r in rows]),
         pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE))],
        names=["doc_id", "spans"],
    )
    v2 = validate_span_order(bad).to_pylist()
    assert v2[0]["spans_valid"] is False
    assert all(r["spans_valid"] for r in v2[1:])


def test_media_refs_feed_multimodal(ray_session):
    from north_cloud_ray.stages.multimodal import decode_images, synth_media_table

    t = synthesize_f1(n_hosts=2, max_docs=30)
    refs = media_refs(t).to_pylist()
    assert all(r["media_ref"].endswith(".jpg") for r in refs)
    media = synth_media_table([(r["doc_id"], r["media_ref"]) for r in refs[:20]])
    out = decode_images(rd.from_arrow(media), concurrency=2).to_pandas()
    assert len(out) == min(20, len(refs))


def test_f1_dataset_pipeline(ray_session):
    """The F1 table as a Dataset input: map_batches over the exact
    input_hint shape."""
    t = synthesize_f1(n_hosts=4, max_docs=100)
    ds = rd.from_arrow(t)
    stats = ds.map_batches(span_stats, batch_format="pyarrow").to_pandas()
    assert len(stats) == t.num_rows
    assert (stats["n_spans"] >= 3).all() and (stats["n_spans"] <= 14).all()
    valid = ds.map_batches(validate_span_order, batch_format="pyarrow").to_pandas()
    assert valid["spans_valid"].all()


def test_reassemble_roundtrip_exact(ray_session):
    """flatten -> distributed reassemble must reproduce the original F1
    table byte-for-byte (spans ordered by offset, doc set preserved)."""
    import pandas as pd
    import ray.data

    from north_cloud_ray.sources.f1 import (
        flatten_spans,
        reassemble_spans,
        synthesize_f1,
    )

    tbl = synthesize_f1(n_hosts=6, max_docs=120)
    flat = ray.data.from_arrow(flatten_spans(tbl)).repartition(5)
    rebuilt = reassemble_spans(flat, num_partitions=4).to_pandas()
    orig = tbl.to_pandas()
    rebuilt = rebuilt.sort_values("doc_id").reset_index(drop=True)
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    assert list(rebuilt["doc_id"]) == list(orig["doc_id"])
    for got, want in zip(rebuilt["spans"], orig["spans"]):
        got = [dict(d) for d in got]
        want = [dict(d) for d in want]
        assert got == want


def _mk_f1(rows):
    """rows: list of (doc_id, [span dicts without offset])."""
    import pyarrow as pa

    from north_cloud_ray.frontier.schema import SPAN_TYPE

    ids, spans = [], []
    for doc_id, ss in rows:
        ids.append(doc_id)
        spans.append([{**s, "offset": i} for i, s in enumerate(ss)])
    return pa.Table.from_arrays(
        [pa.array(ids, type=pa.string()),
         pa.array(spans, type=pa.list_(SPAN_TYPE))],
        names=["doc_id", "spans"])


def _t(x):
    return {"kind": "text", "text": x, "media_ref": ""}


def _m(r):
    return {"kind": "media", "text": "", "media_ref": r}


def test_media_dedup_semantics(ray_session):
    """First (doc_id, offset) occurrence of each ref wins globally;
    blanks and text pass through; offsets renumber to 0..n-1 so the
    rebuilt docs satisfy the span-sequence invariant."""
    import ray.data

    from north_cloud_ray.sources.f1 import media_dedup, validate_span_order

    tbl = _mk_f1([
        ("a", [_t("t0"), _m("img1"), _m("img2")]),
        ("b", [_m("img1"), _t("t1"), _m("img3")]),   # loses img1
        ("c", [_m("img2"), _m("img3")]),             # loses everything
        ("d", [_m(""), _t("t2")]),                   # blank ref survives
    ])
    ds = ray.data.from_arrow(tbl).repartition(3)
    deduped = media_dedup(ds, num_partitions=4).materialize()
    out = deduped.to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = {r["doc_id"]: [(d["kind"], d["media_ref"], d["offset"])
                         for d in r["spans"]]
           for _, r in out.iterrows()}
    assert got == {
        "a": [("text", "", 0), ("media", "img1", 1), ("media", "img2", 2)],
        "b": [("text", "", 0), ("media", "img3", 1)],
        "d": [("media", "", 0), ("text", "", 1)],
    }
    # renumbered offsets keep the ordering invariant (blank-media shape
    # violation in doc d is the validator's job, not dedup's)
    flags = deduped.map_batches(validate_span_order,
                                batch_format="pyarrow").to_pandas()
    assert flags.set_index("doc_id")["spans_valid"]["a"]
    assert flags.set_index("doc_id")["spans_valid"]["b"]


def test_caption_pairs_edges(ray_session):
    """Leading media gets caption ''; each media pairs with the NEAREST
    preceding text; blank-ref media are excluded."""
    import ray.data

    from north_cloud_ray.sources.f1 import caption_pairs

    tbl = _mk_f1([
        ("a", [_m("lead"), _t("one"), _m("x"), _t("two"), _m("y"),
               _m("z"), _m("")]),
    ])
    out = caption_pairs(ray.data.from_arrow(tbl), num_partitions=2) \
        .to_pandas().sort_values("offset")
    assert list(zip(out["media_ref"], out["caption"])) == [
        ("lead", ""), ("x", "one"), ("y", "two"), ("z", "two")]


def test_truncate_spans_edges(ray_session):
    """First span survives even when alone it busts the budget; costs
    count text tokens and the fixed media charge; survivors are a clean
    offset prefix."""
    import ray.data

    from north_cloud_ray.sources.f1 import truncate_spans

    tbl = _mk_f1([
        ("a", [_t(" ".join(["w"] * 50))]),            # 50 > 10: kept (first)
        ("b", [_t("x y z"), _m("r1"), _t("p q"),      # 3 +16 cum=19>10 cut
               _m("r2")]),
        ("c", [_t("a b"), _t("c d"), _t("e f"),       # 2,4,6,8,10 all kept
               _t("g h"), _t("i j"), _t("k l")]),     # 12 > 10 cut
    ])
    out = truncate_spans(ray.data.from_arrow(tbl), budget=10,
                         media_tokens=16, num_partitions=2).to_pandas()
    got = {r["doc_id"]: [(d["kind"], d["offset"]) for d in r["spans"]]
           for _, r in out.iterrows()}
    assert got == {
        "a": [("text", 0)],
        "b": [("text", 0)],
        "c": [("text", 0), ("text", 1), ("text", 2), ("text", 3),
              ("text", 4)],
    }


def test_map_text_spans_media_untouched(ray_session):
    """Text-span transform must leave media spans and offsets intact."""
    import ray.data

    from north_cloud_ray.sources.f1 import map_text_spans

    tbl = _mk_f1([("a", [_t("hello"), _m("ref1"), _t("world")])])
    out = map_text_spans(ray.data.from_arrow(tbl),
                         lambda t: t.str.upper(),
                         num_partitions=2).to_pandas()
    spans = [dict(d) for d in out["spans"].iloc[0]]
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans] == [
        ("text", "HELLO", "", 0), ("media", "", "ref1", 1),
        ("text", "WORLD", "", 2)]
