"""Mining / entertainment / coforge sidecar rule engines — faithful
re-expressions of the reference's three first-match pattern engines
(classifier/internal/classifier/mining_rules.go:33-92,
entertainment_rules.go:30-68, coforge_rules.go:33-71): any core-pattern
match classifies core at 0.90, else any peripheral match classifies
peripheral at 0.70, else not at 0.5, over title + a 500-char body
prefix, lowercased.

Pattern tables are DATA shared by the per-row kernel and the SQL-oracle
generator in pipelines/queries.py. (The reference truncates the body at
500 bytes; this port uses 500 characters — identical on ASCII text.)
"""

from __future__ import annotations

import re

CONFIDENCE_CORE = 0.90
CONFIDENCE_PERIPHERAL = 0.70
CONFIDENCE_DEFAULT = 0.5
RULE_MAX_BODY_CHARS = 500

# mining_rules.go:34-50 — index 2 is the drill-keyword pattern the
# reference also surfaces as drillKeywordMatched for its drill extractor
MINING_CORE_PATTERNS = (
    r"(?i)(gold|silver|copper|zinc|nickel|lithium|uranium)"
    r"\s+(mining|exploration|drill|assay)",
    r"(?i)(mining|exploration)"
    r"\s+(gold|silver|copper|zinc|nickel|lithium|uranium)",
    r"(?i)(drill\s+results?|assay\s+results?|intercept\s+\d)",
    r"(?i)(orebody|ore\s+body|deposit\s+(discovery|estimate))",
    r"(?i)(open-pit|underground)\s+(mine|mining)",
)
MINING_PERIPHERAL_PATTERNS = (
    r"(?i)\bmining\b",
    r"(?i)\bmineral\b",
    r"(?i)\bexploration\b",
    r"(?i)\bdrilling\b",
    r"(?i)\b(resource|reserve)s?\s+(estimate|report)",
    r"(?i)\b(smelter|refinery|concentrate)\b",
)

# entertainment_rules.go:30-46
ENTERTAINMENT_CORE_PATTERNS = (
    r"(?i)\b(film|movie|cinema|box office)\b",
    r"(?i)\b(tv show|series|premiere|finale|episode)\b",
    r"(?i)\b(album|single|tour|concert|grammy|billboard)\b",
    r"(?i)\b(video game|gaming|esports|release date)\b",
    r"(?i)\b(review|rating|oscar|emmy|golden globe)\b",
    r"(?i)\b(celebrity|starring|cast|trailer)\b",
    r"(?i)\b(war film|war movie|combat film|military drama)\b",
    r"(?i)\b(world war i+ film|wwi+ film|vietnam war (?:film|movie))\b",
)
ENTERTAINMENT_PERIPHERAL_PATTERNS = (
    r"(?i)\b(entertainment|arts|culture)\b",
    r"(?i)\b(music|film|television)\b",
    r"(?i)\b(streaming|netflix|spotify)\b",
)

# coforge_rules.go:33-49
COFORGE_CORE_PATTERNS = (
    r"(?i)(startup|company)\s+(open[- ]source|release|launch)"
    r"\s+(sdk|api|tool|framework)",
    r"(?i)(series\s+[a-c]|seed\s+round|raised?\s+\$[\d.]+[mb])"
    r"\s+.*(developer|dev\s+tool|sdk|api|platform)",
    r"(?i)(developer|dev)\s+(tool|platform|sdk|api)"
    r"\s+.*(funding|launch|acqui)",
    r"(?i)(open[- ]source)\s+.*(business|revenue|funding|monetiz)",
)
COFORGE_PERIPHERAL_PATTERNS = (
    r"(?i)\b(series\s+[abc]|seed\s+round|ipo|funding\s+round)\b",
    r"(?i)\b(framework|sdk|api)\s+(release|launch|update)\b",
    r"(?i)\b(open[- ]source|github|npm|crates\.io)\b",
    r"(?i)\b(acqui\w+|merger|partner\w+)\b",
    r"(?i)\b(saas|devtools|developer\s+experience)\b",
)

SIMPLE_DOMAIN_PATTERNS: dict[str, dict[str, tuple[str, ...]]] = {
    "mining": {"core": MINING_CORE_PATTERNS,
               "peripheral": MINING_PERIPHERAL_PATTERNS},
    "entertainment": {"core": ENTERTAINMENT_CORE_PATTERNS,
                      "peripheral": ENTERTAINMENT_PERIPHERAL_PATTERNS},
    "coforge": {"core": COFORGE_CORE_PATTERNS,
                "peripheral": COFORGE_PERIPHERAL_PATTERNS},
}

_COMPILED = {
    d: {k: tuple(re.compile(p) for p in pats) for k, pats in groups.items()}
    for d, groups in SIMPLE_DOMAIN_PATTERNS.items()
}

_MINING_DRILL_RE = re.compile(MINING_CORE_PATTERNS[2])


def classify_simple_rules(domain: str, title: str, body: str) \
        -> tuple[str, float]:
    """('core'|'peripheral'|'not', confidence) per the shared
    first-match shape of the three engines."""
    body = body or ""
    lower = f"{title or ''} {body[:RULE_MAX_BODY_CHARS]}".lower()
    pats = _COMPILED[domain]
    if any(p.search(lower) for p in pats["core"]):
        return "core", CONFIDENCE_CORE
    if any(p.search(lower) for p in pats["peripheral"]):
        return "peripheral", CONFIDENCE_PERIPHERAL
    return "not", CONFIDENCE_DEFAULT


def mining_drill_keyword(title: str, body: str) -> bool:
    """drillKeywordMatched (mining_rules.go:62): the drill/assay/
    intercept core pattern checked independently, feeding the
    reference's drill-result extractor."""
    lower = f"{title or ''} {(body or '')[:RULE_MAX_BODY_CHARS]}".lower()
    return bool(_MINING_DRILL_RE.search(lower))
