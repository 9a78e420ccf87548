"""The F1 interleaved text+media table (BASELINE.json input_hint):

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

``synthesize_f1`` builds it deterministically at any small scale from the
FIXTURES.md F1 generation rule (the same generator the synthetic web
renders pages from — crawl output and this table share one span contract).
The operators below consume that exact shape with vectorized pyarrow
kernels (list_flatten / list_value_length / list_parent_indices — no
Python span loops):

- ``flatten_spans`` / ``reassemble_spans`` (± offset renumbering): the
  explode/re-pack pair every span-level transform composes with;
- ``span_stats`` / ``validate_span_order``: per-doc stats + the
  input_hint's span-sequence invariant;
- ``media_refs``: the multimodal decode feed;
- ``media_dedup``: corpus-wide first-occurrence dedup of media refs
  (one composite-key exchange, invariant-preserving renumbered re-pack);
- ``caption_pairs``: nearest-preceding-text caption candidate per media
  span (grouped forward-fill, no per-doc Python);
- ``map_text_spans``: run a vectorized text kernel (redaction,
  normalization) on text spans only, media alignment untouched;
- ``truncate_spans``: token-budget prefix truncation (text tokens +
  fixed media charge, first span always kept);
- ``render_text``: the dataloader-facing render — spans joined in
  offset order with media sentinels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import SyntheticWebConfig
from ..frontier.normalize import url_hash
from ..frontier.schema import SPAN_TYPE
from .synthetic_web import SyntheticWeb


def synthesize_f1(n_hosts: int = 8, seed: int = 42,
                  max_docs: int | None = None) -> pa.Table:
    """Deterministic F1 table: one row per synthetic page (doc_id =
    url_hash of the canonical page URL), spans per the F1 rule."""
    web = SyntheticWeb(SyntheticWebConfig(n_hosts=n_hosts, seed=seed))
    doc_ids, spans = [], []
    for host in web.hosts():
        for j in range(web.page_count(host)):
            u = web.url_for(host, j)
            doc_ids.append(url_hash(u))
            spans.append(web.expected_spans(u))
            if max_docs is not None and len(doc_ids) >= max_docs:
                break
        if max_docs is not None and len(doc_ids) >= max_docs:
            break
    return pa.Table.from_arrays(
        [pa.array(doc_ids, type=pa.string()),
         pa.array(spans, type=pa.list_(SPAN_TYPE))],
        names=["doc_id", "spans"],
    )


def flatten_spans(batch: pa.Table) -> pa.Table:
    """Explode spans -> one row per span (doc_id, kind, text, media_ref,
    offset). Pure pyarrow: parent indices + flatten, zero Python loops."""
    spans_col = batch["spans"].combine_chunks()
    if isinstance(spans_col, pa.ChunkedArray):  # defensive
        spans_col = spans_col.combine_chunks()
    parent = pc.list_parent_indices(spans_col)
    flat = pc.list_flatten(spans_col)
    doc_ids = pc.take(batch["doc_id"].combine_chunks(), parent)
    return pa.Table.from_arrays(
        [doc_ids,
         pc.struct_field(flat, "kind"),
         pc.struct_field(flat, "text"),
         pc.struct_field(flat, "media_ref"),
         pc.struct_field(flat, "offset")],
        names=["doc_id", "kind", "text", "media_ref", "offset"],
    )


def span_stats(batch: pa.Table) -> pa.Table:
    """Per-doc span statistics, fully vectorized: n_spans, n_media,
    n_text, total_text_chars."""
    spans_col = batch["spans"].combine_chunks()
    n_spans = pc.list_value_length(spans_col)
    flat = pc.list_flatten(spans_col)
    parent = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
    is_media = pc.equal(pc.struct_field(flat, "kind"), "media").to_numpy(
        zero_copy_only=False
    )
    text_len = pc.utf8_length(pc.struct_field(flat, "text")).to_numpy(
        zero_copy_only=False
    )
    n = len(batch)
    n_media = np.zeros(n, dtype=np.int64)
    np.add.at(n_media, parent, is_media.astype(np.int64))
    chars = np.zeros(n, dtype=np.int64)
    np.add.at(chars, parent, text_len)
    return pa.Table.from_arrays(
        [batch["doc_id"].combine_chunks(),
         pc.cast(n_spans, pa.int64()),
         pa.array(n_media),
         pc.subtract(pc.cast(n_spans, pa.int64()), pa.array(n_media)),
         pa.array(chars)],
        names=["doc_id", "n_spans", "n_media", "n_text", "total_text_chars"],
    )


def validate_span_order(batch: pa.Table) -> pa.Table:
    """Span-sequence invariant check (the per-row invariant from the
    input_hint): offsets must be exactly 0..n-1 in order, text spans carry
    text and no media_ref, media spans the reverse. Returns per-doc
    validity flags."""
    flat_tbl = flatten_spans(batch)
    spans_col = batch["spans"].combine_chunks()
    parent = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
    offsets = flat_tbl["offset"].to_numpy(zero_copy_only=False)
    kinds = flat_tbl["kind"].to_numpy(zero_copy_only=False)
    texts = flat_tbl["text"].to_numpy(zero_copy_only=False)
    refs = flat_tbl["media_ref"].to_numpy(zero_copy_only=False)

    n = len(batch)
    ok = np.ones(n, dtype=bool)
    # offsets must restart at 0 per doc and increment by 1
    expected = np.zeros(len(offsets), dtype=np.int64)
    if len(parent):
        starts = np.flatnonzero(np.diff(parent, prepend=-1))
        idx = np.arange(len(parent))
        expected = idx - np.repeat(starts, np.diff(np.append(starts, len(parent))))
    bad_offset = offsets != expected
    is_media = kinds == "media"
    bad_shape = np.where(
        is_media,
        (refs == "") | (texts != ""),
        (texts == "") | (refs != ""),
    )
    bad = bad_offset | bad_shape
    np.logical_and.at(ok, parent, ~bad)
    return pa.Table.from_arrays(
        [batch["doc_id"].combine_chunks(), pa.array(ok)],
        names=["doc_id", "spans_valid"],
    )


def media_refs(batch: pa.Table) -> pa.Table:
    """(doc_id, media_ref) rows — the feed for the multimodal decode stage."""
    flat = flatten_spans(batch)
    media = flat.filter(pc.equal(flat["kind"], "media"))
    return media.select(["doc_id", "media_ref"])


def reassemble_spans(flat_ds, num_partitions: int | None = None,
                     renumber: bool = False):
    """Inverse of ``flatten_spans`` as a distributed operator: span rows
    (doc_id, kind, text, media_ref, offset) -> the F1 (doc_id, spans)
    list<struct> shape, spans ordered by offset. This is the re-pack step
    after any span-level transform (redaction, media swap, re-chunking):
    flatten -> transform rows -> reassemble, with ``validate_span_order``
    as the post-condition.

    One hash exchange keyed by doc_id (each partition holds its docs'
    FULL span sets); the per-partition rebuild is one pyarrow sort +
    ListArray.from_arrays over group boundaries — no per-doc Python
    dispatch. Round-trip equality and an SQL-hash-checked stats twin live
    in tests/queries.

    CONTRACT: a doc whose span list is EMPTY has no flat rows, so it
    cannot round-trip — flatten -> reassemble drops zero-span docs (the
    `f1_reassemble_docs` oracle filters to n_spans > 0 accordingly).
    Callers needing them back must left-join against the original doc-id
    set and attach empty lists.

    ``renumber=True`` reassigns offsets 0..n-1 per doc in original-offset
    order — required after any span-DROPPING transform (dedup, filter),
    where the surviving original offsets have holes and would fail the
    span-sequence invariant."""
    from ..stages.agg import _add_pkey, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()

    routed = flat_ds.map_batches(
        lambda b: _add_pkey(b, ["doc_id"], num_partitions),
        batch_format="pandas")

    def rebuild(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_pkey"]).combine_chunks()
        key_type = part.schema.field("doc_id").type  # string OR int64 keys
        if part.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=key_type),
                 pa.array([], type=pa.list_(SPAN_TYPE))],
                names=["doc_id", "spans"])
        idx = pc.sort_indices(
            part, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")])
        t = part.take(idx).combine_chunks()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        offsets = pa.array(np.append(starts, len(doc)).astype(np.int32),
                           type=pa.int32())
        if renumber:
            counts = np.diff(np.append(starts, len(doc)))
            off_arr = pa.array((np.arange(len(doc))
                                - np.repeat(starts, counts)).astype(np.int32),
                               type=pa.int32())
        else:
            off_arr = pc.cast(t["offset"].combine_chunks(), pa.int32())
        structs = pa.StructArray.from_arrays(
            [t["kind"].combine_chunks(),
             t["text"].combine_chunks(),
             t["media_ref"].combine_chunks(),
             off_arr],
            fields=list(SPAN_TYPE))
        lists = pa.ListArray.from_arrays(offsets, structs)
        doc_keys = t["doc_id"].combine_chunks().take(
            pa.array(starts, type=pa.int64()))
        return pa.Table.from_arrays([doc_keys, lists],
                                    names=["doc_id", "spans"])

    return routed.groupby("_pkey").map_groups(rebuild, batch_format="pyarrow")


def media_dedup(ds, num_partitions: int | None = None):
    """Corpus-wide MEDIA dedup over interleaved docs: every non-blank
    media_ref survives only at its globally first (doc_id, offset)
    occurrence — the interleaved twin of ``curation.line_dedup`` (a
    multimodal corpus repeats the same hero images / logos across
    thousands of pages; training wants each decoded once). Text spans
    and blank-ref media always survive; surviving spans are re-packed
    per doc with offsets RENUMBERED 0..n-1 so the span-sequence
    invariant holds on the output.

    Shape: ONE exchange keyed by a composite dedup key — candidate media
    keyed by their media_ref, everything else by a per-span unique key —
    so the uniform 'keep min-(doc_id, offset) per key' combine dedups
    candidates and passes the rest through without a second scan of the
    input; then the doc-keyed reassembly exchange. Both exchanges carry
    light span rows only."""
    import pandas as pd

    from ..stages.agg import hash_grouped_agg

    flat = ds.map_batches(flatten_spans, batch_format="pyarrow")

    def key(b: pa.Table) -> "pd.DataFrame":
        d = b.to_pandas()
        cand = (d["kind"] == "media") & (d["media_ref"] != "")
        unique = ("u:" + d["doc_id"].astype(str) + ":"
                  + d["offset"].astype(str))
        d["dedup_key"] = np.where(cand, "m:" + d["media_ref"], unique)
        return d

    def keep_first(b: "pd.DataFrame") -> "pd.DataFrame":
        return (b.sort_values(["dedup_key", "doc_id", "offset"],
                              kind="mergesort")
                 .drop_duplicates("dedup_key", keep="first"))

    winners = hash_grouped_agg(flat.map_batches(key, batch_format="pyarrow"),
                               ["dedup_key"], keep_first, keep_first,
                               num_partitions)
    survivors = winners.map_batches(
        lambda b: b[["doc_id", "kind", "text", "media_ref", "offset"]],
        batch_format="pandas")
    return reassemble_spans(survivors, num_partitions, renumber=True)


def caption_pairs(ds, num_partitions: int | None = None):
    """Caption candidates for every non-blank media span: the nearest
    PRECEDING text span's text within the same doc ('' when the media
    leads the doc). One doc-keyed exchange of light span rows; the
    per-partition resolve is a vectorized sort + grouped forward-fill —
    no per-doc Python dispatch. Returns (doc_id, media_ref, offset,
    caption)."""
    import pandas as pd

    from ..stages.agg import hash_grouped_agg

    flat = ds.map_batches(flatten_spans, batch_format="pyarrow")

    def project(b: pa.Table) -> "pd.DataFrame":
        return b.select(["doc_id", "kind", "text", "media_ref",
                         "offset"]).to_pandas()

    def resolve(part: "pd.DataFrame") -> "pd.DataFrame":
        part = part.sort_values(["doc_id", "offset"], kind="mergesort")
        is_text = (part["kind"] == "text").to_numpy()
        cap = part["text"].where(is_text)
        # media rows are NaN, so the grouped ffill hands each one the
        # nearest preceding text span within its doc
        cap = cap.groupby(part["doc_id"], sort=False).ffill()
        part = part.assign(caption=cap.fillna(""))
        media = part[(part["kind"] == "media") & (part["media_ref"] != "")]
        return media[["doc_id", "media_ref", "offset", "caption"]]

    return hash_grouped_agg(flat.map_batches(project, batch_format="pyarrow"),
                            ["doc_id"], lambda b: b, resolve,
                            num_partitions)


def map_text_spans(ds, fn, num_partitions: int | None = None):
    """Span-level text transform preserving the interleave: flatten ->
    apply ``fn`` (a vectorized pandas Series -> Series kernel) to the
    TEXT spans' text only -> reassemble. Media spans pass through
    untouched; offsets are preserved (no spans are added or dropped), so
    the span-sequence invariant survives by construction. This is the
    composition point for running the curation layer (PII redaction,
    normalization) INSIDE interleaved docs without losing media
    alignment."""
    import pandas as pd

    flat = ds.map_batches(flatten_spans, batch_format="pyarrow")

    def apply(b: pa.Table) -> "pd.DataFrame":
        d = b.to_pandas()
        is_text = (d["kind"] == "text").to_numpy()
        if is_text.any():
            t = d["text"].copy()
            t[is_text] = fn(t[is_text])
            d["text"] = t
        return d

    return reassemble_spans(flat.map_batches(apply, batch_format="pyarrow"),
                            num_partitions)


def truncate_spans(ds, budget: int = 96, media_tokens: int = 16,
                   num_partitions: int | None = None):
    """Token-budget PREFIX truncation of interleaved docs: spans are
    kept in offset order while the inclusive running cost stays within
    ``budget`` (text span cost = its whitespace token count, media span
    cost = ``media_tokens``); the first span always survives so no doc
    vanishes. Surviving spans are a prefix, so offsets remain 0..k-1 and
    the span-sequence invariant holds without renumbering.

    One doc-keyed exchange of light span rows; the per-partition resolve
    is a vectorized sort + grouped cumsum — no per-doc Python."""
    import pandas as pd

    from ..stages.agg import hash_grouped_agg

    flat = ds.map_batches(flatten_spans, batch_format="pyarrow")

    def project(b: pa.Table) -> "pd.DataFrame":
        return b.select(["doc_id", "kind", "text", "media_ref",
                         "offset"]).to_pandas()

    def resolve(part: "pd.DataFrame") -> "pd.DataFrame":
        part = part.sort_values(["doc_id", "offset"], kind="mergesort")
        is_media = (part["kind"] == "media").to_numpy()
        cost = np.where(
            is_media, media_tokens,
            part["text"].fillna("").str.split().str.len()
                .fillna(0).to_numpy("int64"))
        cum = pd.Series(cost).groupby(
            part["doc_id"].to_numpy(), sort=False).cumsum().to_numpy()
        keep = (cum <= budget) | (part["offset"].to_numpy() == 0)
        return part[keep]

    kept = hash_grouped_agg(flat.map_batches(project, batch_format="pyarrow"),
                            ["doc_id"], lambda b: b, resolve,
                            num_partitions)
    return reassemble_spans(kept, num_partitions)


def render_text(ds, media_token: str = "<|media|>",
                num_partitions: int | None = None):
    """Render interleaved docs to the flat token stream a dataloader
    consumes: spans joined in offset order with single spaces, each
    media span replaced by the ``media_token`` sentinel (the
    placeholder the model's media embedder swaps in). Returns
    (doc_id, text, n_spans). One doc-keyed exchange of light span
    rows; the per-partition resolve is a vectorized sort + grouped
    string join (output-linear)."""
    import pandas as pd

    from ..stages.agg import hash_grouped_agg

    flat = ds.map_batches(flatten_spans, batch_format="pyarrow")

    def project(b: pa.Table) -> "pd.DataFrame":
        return b.select(["doc_id", "kind", "text", "offset"]).to_pandas()

    def resolve(part: "pd.DataFrame") -> "pd.DataFrame":
        part = part.sort_values(["doc_id", "offset"], kind="mergesort")
        piece = part["text"].where(part["kind"] != "media", media_token)
        g = piece.groupby(part["doc_id"].to_numpy(), sort=False)
        out = g.agg(" ".join)
        sizes = g.size()
        return pd.DataFrame({"doc_id": out.index.to_numpy(),
                             "text": out.to_numpy(dtype=object),
                             "n_spans": sizes.to_numpy("int64")})

    return hash_grouped_agg(flat.map_batches(project,
                                             batch_format="pyarrow"),
                            ["doc_id"], lambda b: b, resolve,
                            num_partitions)
