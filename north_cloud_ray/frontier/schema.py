"""Arrow schemas for the frontier / documents / host-state tables.

Mirrors `url_frontier` (crawler/migrations/014_create_url_frontier.up.sql:2-25),
`host_state` (migrations/015:2-11) and the interleaved text+media document
shape (BASELINE.json input_hint; crawler/internal/storage/
raw_content_indexer.go:18-40 for the fields spans are derived from).
"""

from __future__ import annotations

import pyarrow as pa

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),          # sha256 hex, 64 chars, UNIQUE key
        ("host", pa.string()),
        ("host_hash", pa.int64()),   # host_hash64 < 2^63: int64 avoids pandas uint64/float64 coercion traps
        ("source_id", pa.string()),
        ("origin", pa.string()),            # feed|sitemap|spider|manual|discovered
        ("parent_url", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int8()),            # 1..10
        ("status", pa.string()),            # pending|fetching|fetched|failed|dead
        ("next_fetch_at", pa.int64()),   # virtual us
        ("last_fetched_at", pa.int64()),
        ("fetch_count", pa.int32()),
        ("content_hash", pa.string()),
        ("etag", pa.string()),
        ("last_modified", pa.string()),
        ("retry_count", pa.int8()),
        ("last_error", pa.string()),
        ("discovered_at", pa.int64()),
        # A4 adaptive-recrawl tracker state (hash_tracker.go:20-27): number
        # of consecutive unchanged fetches; recrawl interval doubles with it
        ("unchanged_count", pa.int32()),
    ]
)

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),       # 'text' | 'media'
        ("text", pa.string()),       # '' for media spans
        ("media_ref", pa.string()),  # '' for text spans
        ("offset", pa.int32()),      # span ordinal within the document
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),           # = url_hash of the page
        ("url", pa.string()),
        ("source_id", pa.string()),
        ("host", pa.string()),
        ("title", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),    # interleaved text+media spans
        ("content_hash", pa.string()),     # sha256 of concatenated text spans
        ("word_count", pa.int32()),
        ("fetched_round", pa.int32()),
        ("crawled_at", pa.int64()),       # virtual us
    ]
)

HOST_STATE_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("host_hash", pa.int64()),   # host_hash64 < 2^63: int64 avoids pandas uint64/float64 coercion traps
        ("last_fetch_at", pa.int64()),
        ("min_delay_ms", pa.int32()),
        ("robots_txt", pa.string()),
        ("robots_fetched_at", pa.int64()),
        ("robots_ttl_hours", pa.int32()),
    ]
)

CLAIM_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("claim_seq", pa.int64()),
        ("claim_at", pa.int64()),        # virtual claim time (us)
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("host", pa.string()),
        ("host_hash", pa.int64()),   # host_hash64 < 2^63: int64 avoids pandas uint64/float64 coercion traps
        ("source_id", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int8()),
        ("next_fetch_at", pa.int64()),   # virtual us
        ("etag", pa.string()),
        ("last_modified", pa.string()),
        ("retry_count", pa.int8()),
        ("fetch_count", pa.int32()),
        ("content_hash", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
