"""Crime-sidecar rule engine — a faithful re-expression of the
reference's rule side (classifier/internal/classifier/crime_rules.go:
13-318): title-only exclusion patterns, authority-gated violent-crime
patterns, property/drug/court-outcome/accusation/weapon groups with
per-pattern confidences, the international title downgrade, and the
criminal_justice justice-pattern append.

The pattern table below is DATA shared by two consumers: the per-row
Python kernel (`classify_crime_rules`, run inside map_batches) and the
SQL-oracle generator in pipelines/queries.py (every regex runs verbatim
under DuckDB's regexp_matches), so the two sides cannot drift.
"""

from __future__ import annotations

import re

RELEVANCE_CORE_STREET_CRIME = "core_street_crime"
RELEVANCE_PERIPHERAL_CRIME = "peripheral_crime"
RELEVANCE_NOT_CRIME = "not_crime"

CONFIDENCE_EXCLUSION = 0.95
CONFIDENCE_DEFAULT = 0.5
INTERNATIONAL_DOWNGRADE_RATIO = 0.7
TRUNCATE_BODY_MAX_CHARS = 500

# Title-only exclusions (crime_rules.go:48-60)
EXCLUDE_PATTERNS = (
    r"(?i)^(Register|Sign up|Login|Subscribe)",
    r"(?i)^(Listings? By|Directory|Careers|Jobs)",
    r"(?i)(Part.Time|Full.Time|Hiring|Position)",
    r"(?i)^Local (Sports|Events|Weather)$",
    r"(?i)^(opinion|editorial|commentary|letters?|column|op-ed)\s*:",
    r"(?i)\b(i think|in my view|in our view|we believe|my view)\b",
    r"(?i)\b(renovation|contractor|tournament|recipe|travel guide|lifeline)\b",
    r"(?i)\bbest\s+.+\s+in\s+the\s+.+\s+area\b",
)

# Authority indicators gate fiction/metaphor out of core classifications
_AUTH = (
    r"police|rcmp|opp|sq|court|judge|investigation|suspect|accused|"
    r"officer|constable|detective|prosecution|charged|arrest|sentenced|"
    r"convicted|custody|detained|apprehended|wanted|manhunt"
)

# (regex, confidence, crime_type) per group, in the reference's check
# order; confidences are the crime_rules.go constants.
VIOLENT_CRIME_PATTERNS = (
    (rf"(?i)(murder|homicide|manslaughter).*({_AUTH})", 0.95),
    (rf"(?i)({_AUTH}).*(murder|homicide|manslaughter)", 0.95),
    (rf"(?i)(shooting|shootout|shot dead|gunfire).*({_AUTH})", 0.90),
    (rf"(?i)({_AUTH}).*(shooting|shootout|shot dead|gunfire)", 0.90),
    (rf"(?i)(stab|stabbing|stabbed).*({_AUTH})", 0.90),
    (rf"(?i)({_AUTH}).*(stab|stabbing|stabbed)", 0.90),
    (r"(?i)(assault|assaulted).*(charged|arrest|police)", 0.85),
    (r"(?i)(charged|arrest|police).*(assault|assaulted)", 0.85),
    (r"(?i)(sexual assault|rape|sex assault)", 0.90),
    (r"(?i)(found dead|human remains)", 0.80),
    (rf"(?i)(robbery|robbed|armed robbery).*({_AUTH})", 0.85),
    (rf"(?i)({_AUTH}).*(robbery|robbed|armed robbery)", 0.85),
    (rf"(?i)(carjack\w*).*({_AUTH})", 0.90),
    (rf"(?i)({_AUTH}).*(carjack\w*)", 0.90),
    (rf"(?i)(kidnap\w*|abduct\w*).*({_AUTH})", 0.90),
    (rf"(?i)({_AUTH}).*(kidnap\w*|abduct\w*)", 0.90),
    (r"(?i)(hostage)", 0.90),
)

PROPERTY_CRIME_PATTERNS = (
    (r"(?i)(theft|stolen|shoplifting).*(police|arrest)", 0.85),
    (r"(?i)(burglary|break.in)", 0.85),
    (r"(?i)arson", 0.80),
    (r"(?i)\$[\d,]+.*(stolen|theft)", 0.85),
)

DRUG_CRIME_PATTERNS = (
    (r"(?i)(drug bust|drug raid|drug seizure)", 0.90),
    (r"(?i)(fentanyl|cocaine|heroin).*(seiz|arrest|trafficking)", 0.90),
)

COURT_OUTCOME_PATTERNS = (
    (r"(?i)(sentenced|convicts?\b|convicted|found guilty|pleaded guilty"
     r"|prison term).*(court|judge|jury|prison|jail|penitentiary|charges)",
     0.85),
    (r"(?i)(court|judge|jury).*(sentenced|convicts?\b|convicted"
     r"|found guilty|pleaded guilty|prison term)", 0.85),
)

ACCUSATION_CHARGES_PATTERNS = (
    (r"(?i)(faces?|facing|charged with).*(assault|drug|weapon|theft"
     r"|robbery).*charges", 0.85),
    (r"(?i)(assault|drug|weapon|theft|robbery).*charges"
     r".*(faces?|facing|charged with)", 0.85),
    (r"(?i)(faces?|facing|charged with).*charges"
     r".*(assault|drug|weapon|theft|robbery)", 0.85),
)

WEAPON_AUTHORITY_PATTERNS = (
    (r"(?i)(weapons?).*(charges|arrest|charged|police)", 0.85),
    (r"(?i)(charges|arrest|charged|police).*(weapons?)", 0.85),
)

INTERNATIONAL_PATTERNS = (
    r"(?i)(Minneapolis|U\.S\.|American|Mexico|European|Israel)",
)

JUSTICE_PATTERN = (
    r"(?i)(charged|arrest|sentenced|trial|convicts?\b|convicted"
    r"|found guilty|pleaded guilty|prison term)"
)

_EXCLUDE_RES = tuple(re.compile(p) for p in EXCLUDE_PATTERNS)
_GROUPS = tuple(
    (tuple((re.compile(p), c) for p, c in pats), ctype)
    for pats, ctype in (
        (VIOLENT_CRIME_PATTERNS, "violent_crime"),
        (PROPERTY_CRIME_PATTERNS, "property_crime"),
        (DRUG_CRIME_PATTERNS, "drug_crime"),
        (COURT_OUTCOME_PATTERNS, "criminal_justice"),
    )
)
_ACCUSATION_RES = tuple((re.compile(p), c)
                        for p, c in ACCUSATION_CHARGES_PATTERNS)
_WEAPON_RES = tuple((re.compile(p), c) for p, c in WEAPON_AUTHORITY_PATTERNS)
_INTERNATIONAL_RES = tuple(re.compile(p) for p in INTERNATIONAL_PATTERNS)
_JUSTICE_RE = re.compile(JUSTICE_PATTERN)


def truncate_body(body: str) -> str:
    """First 500 characters of body for rule matching
    (crime_rules.go truncateBody)."""
    return (body or "")[:TRUNCATE_BODY_MAX_CHARS]


def classify_crime_rules(title: str, body: str) -> tuple[str, float, list[str]]:
    """(relevance, confidence, crime_types) per crime_rules.go
    classifyByRules: exclusions and international checks read the title
    only; positive checks read title + 500-char body prefix."""
    title = title or ""
    if any(p.search(title) for p in _EXCLUDE_RES):
        return RELEVANCE_NOT_CRIME, CONFIDENCE_EXCLUSION, []

    text = f"{title} {truncate_body(body)}"
    relevance = RELEVANCE_NOT_CRIME
    confidence = CONFIDENCE_DEFAULT
    crime_types: list[str] = []

    for patterns, ctype in _GROUPS:
        for pat, conf in patterns:
            if pat.search(text):
                relevance = RELEVANCE_CORE_STREET_CRIME
                confidence = max(confidence, conf)
                if ctype not in crime_types:
                    crime_types.append(ctype)

    for pat, conf in _ACCUSATION_RES:
        if pat.search(text):
            relevance = RELEVANCE_CORE_STREET_CRIME
            confidence = max(confidence, conf)
            lower = text.lower()
            if (("assault" in lower or "weapon" in lower
                 or "robbery" in lower)
                    and "violent_crime" not in crime_types):
                crime_types.append("violent_crime")
            if "drug" in lower and "drug_crime" not in crime_types:
                crime_types.append("drug_crime")
            if "theft" in lower and "property_crime" not in crime_types:
                crime_types.append("property_crime")
            break

    for pat, conf in _WEAPON_RES:
        if pat.search(text):
            relevance = RELEVANCE_CORE_STREET_CRIME
            confidence = max(confidence, conf)
            if "violent_crime" not in crime_types:
                crime_types.append("violent_crime")

    if relevance == RELEVANCE_CORE_STREET_CRIME and any(
            p.search(title) for p in _INTERNATIONAL_RES):
        relevance = RELEVANCE_PERIPHERAL_CRIME
        confidence *= INTERNATIONAL_DOWNGRADE_RATIO

    # the reference's final justice append is UNCONDITIONAL (no dedup,
    # crime_rules.go:185-187): a court-outcome text carries
    # criminal_justice twice — mirrored faithfully
    if crime_types and _JUSTICE_RE.search(text):
        crime_types.append("criminal_justice")

    return relevance, confidence, crime_types
