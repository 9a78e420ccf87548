"""Hybrid rules+ML merge matrix tests (indigenous.go:161-204 semantics)."""

import pytest
import ray.data as rd

from north_cloud_ray.stages.scorer import (
    PATH_BOTH_AGREE,
    PATH_DEFAULT,
    PATH_ML_OVERRIDE,
    PATH_ML_UPGRADE,
    PATH_RULE_OVERRIDE,
    PATH_RULES_ONLY,
    RELEVANCE_CORE,
    RELEVANCE_NOT,
    RELEVANCE_PERIPHERAL,
    ScorerActor,
    StubModel,
    merge_results,
    rule_score,
    score_documents,
)


@pytest.mark.parametrize(
    "rule,ml,want",
    [
        # (rule_rel, rule_conf), (ml_rel, ml_conf) -> (rel, conf, review, path)
        ((RELEVANCE_CORE, 0.8), (RELEVANCE_CORE, 0.9),
         (RELEVANCE_CORE, 0.85, False, PATH_BOTH_AGREE)),
        ((RELEVANCE_CORE, 0.8), (RELEVANCE_NOT, 0.9),
         (RELEVANCE_CORE, 0.8 * 0.7, True, PATH_RULE_OVERRIDE)),
        ((RELEVANCE_CORE, 0.8), None,
         (RELEVANCE_CORE, 0.8, False, PATH_RULES_ONLY)),
        ((RELEVANCE_CORE, 0.8), (RELEVANCE_PERIPHERAL, 0.9),
         (RELEVANCE_CORE, 0.8, False, PATH_RULES_ONLY)),
        ((RELEVANCE_NOT, 0.6), (RELEVANCE_CORE, 0.95),
         (RELEVANCE_PERIPHERAL, 0.95 * 0.8, True, PATH_ML_OVERRIDE)),
        ((RELEVANCE_NOT, 0.6), (RELEVANCE_CORE, 0.85),
         (RELEVANCE_NOT, 0.6, False, PATH_DEFAULT)),  # below override threshold
        ((RELEVANCE_PERIPHERAL, 0.65), (RELEVANCE_CORE, 0.8),
         (RELEVANCE_CORE, 0.8, False, PATH_ML_UPGRADE)),
        ((RELEVANCE_PERIPHERAL, 0.65), (RELEVANCE_NOT, 0.7),
         (RELEVANCE_PERIPHERAL, 0.65, False, PATH_DEFAULT)),
    ],
)
def test_merge_matrix(rule, ml, want):
    got = merge_results(rule[0], rule[1], ml)
    assert got[0] == want[0]
    assert got[1] == pytest.approx(want[1])
    assert got[2:] == want[2:]


def test_rule_score_tiers():
    """Each domain dispatches to its faithful ported engine."""
    # crime (crime_rules.go): crime action + authority indicator
    assert rule_score("police respond to downtown shooting", "crime") == \
        (RELEVANCE_CORE, 0.90)
    assert rule_score("nothing here", "crime") == (RELEVANCE_NOT, 0.5)
    # authority gate: fiction/metaphor without authority is not core
    assert rule_score("murder mystery on stage", "crime")[0] == RELEVANCE_NOT
    # title-only international downgrade
    rel, conf = rule_score(
        "", "crime", title="U.S. police investigate murder in Minneapolis")
    assert rel == RELEVANCE_PERIPHERAL
    assert conf == pytest.approx(0.95 * 0.7)
    # mining (mining_rules.go): first-match 0.90 / 0.70 / 0.5 tiers
    assert rule_score("gold mining expands in the region", "mining") == \
        (RELEVANCE_CORE, 0.90)
    assert rule_score("a mineral claim was staked", "mining") == \
        (RELEVANCE_PERIPHERAL, 0.70)
    assert rule_score("nothing relevant", "mining") == (RELEVANCE_NOT, 0.5)
    # entertainment
    assert rule_score("the film opens friday", "entertainment") == \
        (RELEVANCE_CORE, 0.90)
    assert rule_score("local arts coverage", "entertainment") == \
        (RELEVANCE_PERIPHERAL, 0.70)


def test_stub_model_deterministic_and_fallback():
    m = StubModel("crime")
    assert m.classify("d1", "x") == m.classify("d1", "x")
    assert StubModel("crime", available=False).classify("d1", "x") is None


def test_score_documents_stage(ray_session):
    import pandas as pd

    docs = rd.from_pandas(pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "body": ["police arrested a man after an armed robbery",
                     "music festival tonight",
                     "nothing at all"],
            "content_type": ["article", "article", "page"],
        }
    ))
    out = score_documents(docs, concurrency=2).to_pandas()
    # page content type routes to no sidecars (J5 routing table)
    assert "c" not in set(out["doc_id"])
    a = out[(out["doc_id"] == "a") & (out["domain"] == "crime")].iloc[0]
    assert a["rule_relevance"] == RELEVANCE_CORE
    assert a["decision_path"] in (PATH_BOTH_AGREE, PATH_RULE_OVERRIDE,
                                  PATH_RULES_ONLY)
    # rules-only fallback when the sidecar is down
    down = score_documents(docs, concurrency=2, ml_available=False).to_pandas()
    assert set(down["decision_path"]) <= {PATH_RULES_ONLY, PATH_DEFAULT}


def test_indigenous_coforge_domains_routed_and_scored():
    """The two sidecar domains the reference also runs (classifier.go:79-81)
    are registered and routed; scoring runs their faithful engines."""
    from north_cloud_ray.stages.scorer import (
        RELEVANCE_CORE,
        RELEVANCE_NOT,
        RELEVANCE_PERIPHERAL,
        ROUTING_TABLE,
        SIDECAR_DOMAINS,
        rule_score,
    )

    assert {"indigenous", "coforge"} <= set(SIDECAR_DOMAINS)
    assert {"indigenous", "coforge"} <= set(ROUTING_TABLE["article"])

    rel, conf = rule_score(
        "the first nations council discussed treaty rights today",
        "indigenous")
    assert rel == RELEVANCE_CORE and conf > 0.6
    rel, _ = rule_score("a plain hockey story", "indigenous")
    assert rel == RELEVANCE_NOT
    rel, conf = rule_score(
        "the developer platform launch attracted new funding", "coforge")
    assert rel == RELEVANCE_CORE and conf == 0.90
    rel, conf = rule_score("the company completed an ipo", "coforge")
    assert rel == RELEVANCE_PERIPHERAL and conf == 0.70


def test_scorer_matrix_covers_new_domains(ray_session):
    """score_documents emits rows for all five routed domains."""
    import pandas as pd
    import ray

    from north_cloud_ray.stages.scorer import score_documents

    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(4)],
        "body": ["police arrest near the mine",
                 "first nations band council meeting",
                 "startup funding for an sdk",
                 "a concert and film festival"],
        "content_type": ["article"] * 4,
    })
    out = score_documents(ray.data.from_pandas(docs)).to_pandas()
    assert set(out["domain"]) == {"crime", "mining", "entertainment",
                                  "indigenous", "coforge"}
    assert (out.groupby("doc_id").size() == 5).all()
