"""Gopher-style repetition signals + exact duplicate-span detection.

Unit cases with hand-computable answers, plus DuckDB oracle equality on
the real testdata (the same SQL shape as the driver oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from north_cloud_ray.stages.repetition import (
    dup_span_stats,
    repetition_stats,
)

SF = "/root/testdata/sf0.001"


def _ds(rows, blocks=2):
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(blocks)


def test_repetition_hand_cases(ray_session):
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            # 6 tokens, bigram "a b" x3 of 5 bigrams, trigram "a b a" x2 of 4
            "a b a b a b",
            # 10 tokens all distinct: no repeats at all
            "q w e r t y u i o p",
            "",  # empty
            # the 5-gram "a b c d e" occurs twice -> covers all 10 tokens
            "a b c d e a b c d e",
        ],
    }
    out = (repetition_stats(_ds(rows)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [6, 10, 0, 10]
    assert out["top_2gram_frac"].tolist() == [3 / 5, 1 / 9, 0.0, 2 / 9]
    assert out["top_3gram_frac"].tolist() == [2 / 4, 1 / 8, 0.0, 2 / 8]
    # doc 1: 5-grams "ababa"x1 "babab"x1 -> no dup; doc 4: full coverage
    assert out["dup_5gram_token_frac"].tolist() == [0.0, 0.0, 0.0, 1.0]
    assert out["keep"].tolist() == [False, True, True, False]


def test_dup_span_hand_cases(ray_session):
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"{shared} tail1 tail2",        # 10 tokens, dup window at pos 0
            f"head0 {shared}",              # 9 tokens, dup window at pos 1
            "no repeats here at all just unique words only",  # 9 tokens
            "short doc",                    # < k tokens: no windows
        ],
    }
    out = (dup_span_stats(_ds(rows), k=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [10, 9, 9, 2]
    assert out["n_windows"].tolist() == [3, 2, 2, 0]
    assert out["n_dup_windows"].tolist() == [1, 1, 0, 0]
    assert out["dup_token_frac"].tolist() == [8 / 10, 8 / 9, 0.0, 0.0]


def test_dup_span_all_unique_corpus(ray_session):
    # no repeated hash anywhere: the hot set is empty and the candidate
    # stream is entirely empty (schema-less edge) — base rows must still
    # come through with zero counts
    rows = {
        "doc_id": [1, 2],
        "text": ["a b c d e f g h i j", "k l m n o p q r s t"],
    }
    out = (dup_span_stats(_ds(rows), k=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_dup_windows"].tolist() == [0, 0]
    assert out["dup_token_frac"].tolist() == [0.0, 0.0]
    assert out["n_windows"].tolist() == [3, 3]


def test_dup_span_self_repeat_counts(ray_session):
    # a gram repeated WITHIN one doc is a duplicate span too (global
    # occurrence count > 1, self-repeats included)
    text = "a b c d e f g h x a b c d e f g h"  # 17 tokens, dup at 0 and 9
    out = dup_span_stats(_ds({"doc_id": [7], "text": [text]}), k=8).to_pandas()
    assert out["n_dup_windows"].tolist() == [2]
    assert out["dup_token_frac"].tolist() == [16 / 17]


@pytest.mark.parametrize("query", ["doc_repetition_stats", "dup_span_docs"])
def test_oracle_equality_testdata(ray_session, query):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = (QUERIES[query](SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (con.execute(ORACLE_SQL[query]).df()[got.columns]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the testdata must actually exercise the positive paths
    if query == "doc_repetition_stats":
        assert (got["dup_5gram_token_frac"] > 0).any()
        assert (~got["keep"]).any()
    else:
        assert (got["n_dup_windows"] > 0).any()
