"""Hybrid rules+ML sidecar scorer — the A6 stage with the reference's
decision matrix and review_required semantics.

Reference semantics (classifier/internal/classifier/indigenous.go:131-204,
mirrored by the mining/entertainment sidecars; ml-sidecars/README.md):

- rule side: each domain runs its FAITHFUL ported engine — crime
  (crime_rules.py, authority-gated groups), indigenous
  (indigenous_rules.py, multilingual + category bonus), mining/
  entertainment/coforge (domain_rules.py, first-match 0.90/0.70/0.5) —
  whose domain-specific relevance labels map onto {core, peripheral,
  not} for the matrix.
- ML side: a model maps a relevance score to the same classes (core >= 0.7,
  peripheral >= 0.3). Sidecar errors/unreachable => rules-only fallback
  (classifier.go:350-369).
- merge decision matrix (applyDecisionLogic):
    rule=core & ml=core      -> core, (rc+mc)/2,      review=False, both_agree
    rule=core & ml=not       -> core, rc*0.7,         review=True,  rule_override
    rule=core (ml silent/else)-> core, rc,            review=False, rules_only
    ml=core & mc>=0.90       -> peripheral, mc*0.8,   review=True,  ml_override
    rule=peripheral & ml=core-> core, mc,             review=False, ml_upgrade
    else                     -> rule result,          review=False, default

The "model" here is a deterministic stub (hash-derived score) loaded once
per actor — the Ray-side contract (actor pool, batch inference, fallback
path) is real; swap ``StubModel`` for a real client outside the sandbox.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

RELEVANCE_CORE = "core"
RELEVANCE_PERIPHERAL = "peripheral"
RELEVANCE_NOT = "not"

# decision-path labels (classifier/internal/classifier/decision_paths)
PATH_BOTH_AGREE = "both_agree"
PATH_RULE_OVERRIDE = "rule_override_ml"
PATH_RULES_ONLY = "rules_only"
PATH_ML_OVERRIDE = "ml_override"
PATH_ML_UPGRADE = "ml_upgrade"
PATH_DEFAULT = "default"

_RULE_ML_DISAGREE_WEIGHT = 0.7
_ML_OVERRIDE_THRESHOLD = 0.90
_ML_OVERRIDE_WEIGHT = 0.8

# The five reference sidecar domains. Each rule side is the FAITHFUL
# engine ported from the reference: crime_rules.py (authority-gated
# pattern groups), indigenous_rules.py (multilingual patterns +
# category bonus), domain_rules.py (mining/entertainment/coforge
# first-match 0.90/0.70/0.5 engines). rule_score maps each engine's
# domain-specific relevance labels onto the shared core/peripheral/not
# classes the decision matrix operates on.
SIDECAR_DOMAINS: tuple[str, ...] = (
    "crime", "mining", "entertainment", "indigenous", "coforge")

# J5 routing table (classifier.go:126-150): content subtype -> sidecar list,
# fallback 'article'
ROUTING_TABLE: dict[str, tuple[str, ...]] = {
    "article": ("crime", "mining", "entertainment", "indigenous", "coforge"),
    "page": (),
    "listing": (),
}

# Canonical indigenous region taxonomy
# (infrastructure/indigenous/region.go:11-33)
ALLOWED_REGIONS = frozenset(
    ("canada", "us", "latin_america", "oceania", "europe", "asia", "africa"))


def normalize_region_slug(raw: str) -> str:
    """Region-slug normalization (region.go:40-59): trim, lowercase,
    spaces/hyphens -> underscores; '' stays '' (not-set is valid);
    anything outside the canonical set raises ValueError (the reference
    returns an error)."""
    s = (raw or "").strip()
    if not s:
        return ""
    s = s.lower().replace(" ", "_").replace("-", "_")
    if s not in ALLOWED_REGIONS:
        raise ValueError(f"invalid indigenous region {raw!r}")
    return s


# domain-specific relevance labels -> the shared matrix classes
_RELEVANCE_CLASS = {
    "core_street_crime": RELEVANCE_CORE,
    "peripheral_crime": RELEVANCE_PERIPHERAL,
    "not_crime": RELEVANCE_NOT,
    "core_indigenous": RELEVANCE_CORE,
    "peripheral_indigenous": RELEVANCE_PERIPHERAL,
    "not_indigenous": RELEVANCE_NOT,
    "core": RELEVANCE_CORE,
    "peripheral": RELEVANCE_PERIPHERAL,
    "not": RELEVANCE_NOT,
}


def rule_score(text: str, domain: str, title: str = "") -> tuple[str, float]:
    """Rule side of the hybrid matrix: each domain runs its faithful
    ported engine (crime_rules.py / indigenous_rules.py /
    domain_rules.py), with the engine's domain-specific relevance label
    mapped onto the shared core/peripheral/not classes."""
    if domain == "crime":
        from .crime_rules import classify_crime_rules

        rel, conf, _types = classify_crime_rules(title, text)
    elif domain == "indigenous":
        from .indigenous_rules import classify_indigenous_rules

        rel, conf = classify_indigenous_rules(title, text)
    else:
        from .domain_rules import classify_simple_rules

        rel, conf = classify_simple_rules(domain, title, text)
    return _RELEVANCE_CLASS[rel], conf


class StubModel:
    """Deterministic stand-in for a FastAPI sidecar model: relevance score
    derived from content hash; maps to classes at 0.7/0.3 thresholds
    (indigenous.go:117-130)."""

    def __init__(self, domain: str, seed: int = 42, available: bool = True):
        self.domain = domain
        self.seed = seed
        self.available = available

    def classify(self, doc_id: str, text: str) -> tuple[str, float] | None:
        if not self.available:
            return None  # unreachable sidecar -> rules-only fallback
        h = hashlib.sha256(f"{self.seed}:{self.domain}:{doc_id}".encode()).digest()
        score = h[0] / 255.0
        confidence = 0.5 + (h[1] / 255.0) / 2.0
        if score >= 0.7:
            return RELEVANCE_CORE, confidence
        if score >= 0.3:
            return RELEVANCE_PERIPHERAL, confidence
        return RELEVANCE_NOT, confidence


def merge_results(
    rule_rel: str, rule_conf: float,
    ml: tuple[str, float] | None,
) -> tuple[str, float, bool, str]:
    """The applyDecisionLogic matrix (indigenous.go:161-204).

    Returns (relevance, final_confidence, review_required, decision_path).
    """
    ml_rel, ml_conf = (ml if ml is not None else ("", 0.0))
    if rule_rel == RELEVANCE_CORE and ml_rel == RELEVANCE_CORE:
        return RELEVANCE_CORE, (rule_conf + ml_conf) / 2.0, False, PATH_BOTH_AGREE
    if rule_rel == RELEVANCE_CORE and ml_rel == RELEVANCE_NOT:
        return (RELEVANCE_CORE, rule_conf * _RULE_ML_DISAGREE_WEIGHT, True,
                PATH_RULE_OVERRIDE)
    if rule_rel == RELEVANCE_CORE:
        return RELEVANCE_CORE, rule_conf, False, PATH_RULES_ONLY
    if ml_rel == RELEVANCE_CORE and ml_conf >= _ML_OVERRIDE_THRESHOLD:
        return (RELEVANCE_PERIPHERAL, ml_conf * _ML_OVERRIDE_WEIGHT, True,
                PATH_ML_OVERRIDE)
    if rule_rel == RELEVANCE_PERIPHERAL and ml_rel == RELEVANCE_CORE:
        return RELEVANCE_CORE, ml_conf, False, PATH_ML_UPGRADE
    return rule_rel, rule_conf, False, PATH_DEFAULT


class ScorerActor:
    """map_batches actor: models loaded once per actor (__init__), batch
    scoring in __call__; routing-table-gated per content type (J5)."""

    def __init__(self, domains: tuple[str, ...] | None = None, seed: int = 42,
                 ml_available: bool = True):
        self.domains = tuple(domains or SIDECAR_DOMAINS)
        self.models = {d: StubModel(d, seed, ml_available) for d in self.domains}

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        bodies = batch["body"].to_pylist()
        ctypes = (
            batch["content_type"].to_pylist()
            if "content_type" in batch.column_names else ["article"] * len(doc_ids)
        )
        titles = (
            batch["title"].to_pylist()
            if "title" in batch.column_names else [""] * len(doc_ids)
        )
        out_rows = []
        for doc_id, body, ctype, title in zip(doc_ids, bodies, ctypes, titles):
            routed = ROUTING_TABLE.get(ctype, ROUTING_TABLE["article"])
            for d in self.domains:
                if d not in routed:
                    continue
                r_rel, r_conf = rule_score(body or "", d, title or "")
                ml = self.models[d].classify(doc_id, body or "")
                rel, conf, review, path = merge_results(r_rel, r_conf, ml)
                out_rows.append(
                    {"doc_id": doc_id, "domain": d, "relevance": rel,
                     "final_confidence": round(conf, 6),
                     "rule_relevance": r_rel,
                     "ml_relevance": ml[0] if ml else None,
                     "review_required": review, "decision_path": path}
                )
        return pa.Table.from_pylist(out_rows) if out_rows else pa.Table.from_pydict(
            {"doc_id": pa.array([], type=batch["doc_id"].type),
             "domain": pa.array([], type=pa.string()),
             "relevance": pa.array([], type=pa.string()),
             "final_confidence": pa.array([], type=pa.float64()),
             "rule_relevance": pa.array([], type=pa.string()),
             "ml_relevance": pa.array([], type=pa.string()),
             "review_required": pa.array([], type=pa.bool_()),
             "decision_path": pa.array([], type=pa.string())}
        )


_SCORER_STATE: dict = {}


def _scorer_fn(batch: pa.Table, *, domains, ml_available) -> pa.Table:
    key = (domains, ml_available)
    actor = _SCORER_STATE.get(key)
    if actor is None:
        actor = _SCORER_STATE[key] = ScorerActor(domains, 42, ml_available)
    return actor(batch)


def score_documents(classified_ds, domains: tuple[str, ...] | None = None,
                    concurrency: int | None = None, batch_size: int = 1024,
                    ml_available: bool = True):
    """Sidecar scoring stage. Default: stateless tasks with per-worker-
    process model state (models load once per process). Pass ``concurrency``
    for an explicit actor pool — but beware chaining multiple pools whose
    reserved CPUs sum to the whole session (the read stage starves)."""
    if concurrency is not None:
        return classified_ds.map_batches(
            ScorerActor,
            fn_constructor_args=(domains, 42, ml_available),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    from functools import partial

    domains = tuple(domains) if domains is not None else None
    return classified_ds.map_batches(
        partial(_scorer_fn, domains=domains, ml_available=ml_available),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
