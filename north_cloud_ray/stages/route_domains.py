"""Publisher routing domains — faithful re-expression of the
reference's fixed-order 12-domain channel router
(publisher/internal/router/service.go:216-259 and the domain files:
domain_topic.go, domain_dbchannel.go, crime.go, location.go, mining.go,
entertainment.go, indigenous.go, domain_coforge.go, domain_recipe.go,
domain_job.go, domain_rfp.go, domain_need_signal.go).

``route_item`` takes a classified content item (plain dict — the flat
and nested fields the classifier emits) and returns the ordered channel
list across all twelve domains. Pure per-row kernel for map_batches; no
cross-row state.
"""

from __future__ import annotations

from .indigenous_rules import RELEVANCE_NOT_INDIGENOUS
from .publish import Channel

# topics with dedicated routing layers are excluded from Layer-1
# auto-routing (domain_topic.go layer1SkipTopics)
LAYER1_SKIP_TOPICS = frozenset(
    ("mining", "indigenous", "coforge", "recipe", "jobs", "rfp",
     "need_signal"))

INDIGENOUS_CONFIDENCE_THRESHOLD = 0.35
MAX_CHANNELS_PER_ITEM = 30  # service.go warn threshold


def _slug(s: str, underscores: bool = False, spaces: bool = False) -> str:
    out = s
    if underscores:
        out = out.replace("_", "-")
    if spaces:
        out = out.replace(" ", "-")
    return out.lower()


def route_topics(item: dict) -> list[str]:
    """Layer 1: content:{topic} for non-skipped topics."""
    return [f"content:{t}" for t in item.get("topics") or ()
            if t not in LAYER1_SKIP_TOPICS]


def route_db_channels(item: dict, channels: tuple[Channel, ...]) -> list[str]:
    """Layer 2: database-configured channels (domain_dbchannel.go;
    rules = min quality + content type + include/exclude topics)."""
    topics = set(item.get("topics") or ())
    out = []
    for ch in channels:
        if item.get("content_type") not in ch.content_types:
            continue
        if (item.get("quality_score") or 0) < ch.min_quality:
            continue
        if ch.include_topics and not (topics & set(ch.include_topics)):
            continue
        if ch.exclude_topics and (topics & set(ch.exclude_topics)):
            continue
        out.append(ch.name)
    return out


def route_crime(item: dict) -> list[str]:
    """crime.go: peripheral sub-labels -> courts/context; core ->
    homepage (if eligible) + category pages."""
    rel = item.get("crime_relevance") or ""
    if rel in ("", "not_crime"):
        return []
    if rel == "peripheral_crime":
        sub = item.get("crime_sub_label") or ""
        if sub == "criminal_justice":
            return ["crime:courts"]
        return ["crime:context"]
    out = []
    if item.get("homepage_eligible"):
        out.append("crime:homepage")
    for cat in item.get("category_pages") or ():
        out.append(f"crime:category:{cat}")
    return out


def route_location(item: dict) -> list[str]:
    """location.go: geographic channels per ACTIVE classifier prefix
    (crime, entertainment; mining handles its own geography)."""
    country = item.get("location_country") or ""
    if country in ("", "unknown"):
        return []
    prefixes = []
    if (item.get("crime_relevance") or "") not in ("", "not_crime"):
        prefixes.append("crime")
    ent = item.get("entertainment")
    if ent and (ent.get("relevance") or "") not in ("",
                                                    "not_entertainment"):
        prefixes.append("entertainment")
    if not prefixes:
        return []
    if country != "canada":
        return [f"{p}:international" for p in prefixes]
    out = []
    for p in prefixes:
        if item.get("location_specificity") == "city" \
                and item.get("location_city"):
            out.append(f"{p}:local:{item['location_city']}")
        if item.get("location_province"):
            out.append(f"{p}:province:{item['location_province'].lower()}")
        out.append(f"{p}:canada")
    return out


def route_mining(item: dict) -> list[str]:
    """mining.go: catch-all + relevance + commodity/stage/geography."""
    m = item.get("mining")
    if not m:
        return []
    rel = m.get("relevance") or ""
    if rel in ("", "not_mining"):
        return []
    out = ["content:mining"]
    if rel == "core_mining":
        out.append("mining:core")
    elif rel == "peripheral_mining":
        out.append("mining:peripheral")
    for c in m.get("commodities") or ():
        slug = _slug(c, underscores=True)
        if slug:
            out.append(f"mining:commodity:{slug}")
    stage = m.get("mining_stage") or ""
    if stage and stage != "unspecified":
        out.append(f"mining:stage:{stage.lower()}")
    loc = m.get("location") or ""
    if loc in ("local_canada", "national_canada"):
        out.append("mining:canada")
    elif loc == "international":
        out.append("mining:international")
    return out


def route_entertainment(item: dict) -> list[str]:
    """entertainment.go: homepage (core+eligible), categories,
    peripheral."""
    e = item.get("entertainment")
    if not e:
        return []
    rel = e.get("relevance") or ""
    if rel in ("", "not_entertainment"):
        return []
    out = []
    if rel == "core_entertainment" and e.get("homepage_eligible"):
        out.append("entertainment:homepage")
    for cat in e.get("categories") or ():
        slug = _slug(cat, spaces=True)
        if slug:
            out.append(f"entertainment:category:{slug}")
    if rel == "peripheral_entertainment":
        out.append("entertainment:peripheral")
    return out


def route_indigenous(item: dict) -> list[str]:
    """indigenous.go: confidence-gated catch-all + category + region."""
    ind = item.get("indigenous")
    if not ind:
        return []
    rel = ind.get("relevance") or ""
    if rel in ("", RELEVANCE_NOT_INDIGENOUS):
        return []
    if (ind.get("final_confidence") or 0.0) < INDIGENOUS_CONFIDENCE_THRESHOLD:
        return []
    out = ["content:indigenous"]
    for cat in ind.get("categories") or ():
        slug = _slug(cat, spaces=True)
        if slug:
            out.append(f"indigenous:category:{slug}")
    region = ind.get("region") or ""
    if region:
        from .scorer import normalize_region_slug

        try:
            region_slug = normalize_region_slug(region)
        except ValueError:
            region_slug = ""
        if region_slug:
            out.append(f"indigenous:region:{region_slug}")
    return out


def route_coforge(item: dict) -> list[str]:
    """domain_coforge.go: product-specific domain — no catch-all;
    relevance anchor + audience/topic/industry sub-channels."""
    c = item.get("coforge")
    if not c:
        return []
    rel = c.get("relevance") or ""
    if rel in ("", "not_relevant"):
        return []
    if rel == "core_coforge":
        out = ["coforge:core"]
    elif rel == "peripheral":
        out = ["coforge:peripheral"]
    else:
        return []
    aud = c.get("audience") or ""
    if aud:
        out.append("coforge:audience:" + _slug(aud, underscores=True,
                                               spaces=True))
    for t in c.get("topics") or ():
        slug = _slug(t, underscores=True)
        if slug:
            out.append(f"coforge:topic:{slug}")
    for ind in c.get("industries") or ():
        slug = _slug(ind, underscores=True)
        if slug:
            out.append(f"coforge:industry:{slug}")
    return out


def route_recipe(item: dict) -> list[str]:
    r = item.get("recipe")
    if not r:
        return []
    out = ["content:recipes"]
    if r.get("category"):
        out.append("recipes:category:" + _slug(r["category"], spaces=True))
    if r.get("cuisine"):
        out.append("recipes:cuisine:" + _slug(r["cuisine"], spaces=True))
    return out


def route_job(item: dict) -> list[str]:
    j = item.get("job")
    if not j:
        return []
    out = ["content:jobs"]
    if j.get("employment_type"):
        out.append("jobs:type:" + _slug(j["employment_type"],
                                        underscores=True))
    if j.get("industry"):
        out.append("jobs:industry:" + _slug(j["industry"], spaces=True))
    return out


def route_rfp(item: dict) -> list[str]:
    r = item.get("rfp")
    if not r:
        return []
    out = ["content:rfps"]
    if r.get("country"):
        out.append("rfp:country:" + r["country"].lower())
    if r.get("province"):
        out.append("rfp:province:" + r["province"].lower())
    for cat in r.get("categories") or ():
        out.append("rfp:sector:" + _slug(cat, spaces=True))
    if r.get("procurement_type"):
        out.append("rfp:type:" + _slug(r["procurement_type"], spaces=True))
    return out


def route_need_signal(item: dict) -> list[str]:
    n = item.get("need_signal")
    if not n:
        return []
    out = ["content:need-signals"]
    if n.get("signal_type"):
        out.append("need-signal:type:" + n["signal_type"].lower())
    if n.get("province"):
        out.append("need-signal:province:" + n["province"].lower())
    if n.get("sector"):
        out.append("need-signal:sector:" + n["sector"].lower())
    return out


def route_item(item: dict,
               channels: tuple[Channel, ...] = ()) -> list[str]:
    """All twelve domains in the reference's fixed order
    (service.go:220-233); duplicate channels collapse to their first
    occurrence (per-channel publish dedup makes re-publishing to the
    same channel within one item a no-op)."""
    ordered = (
        route_topics(item)
        + route_db_channels(item, channels)
        + route_crime(item)
        + route_location(item)
        + route_mining(item)
        + route_entertainment(item)
        + route_indigenous(item)
        + route_coforge(item)
        + route_recipe(item)
        + route_job(item)
        + route_rfp(item)
        + route_need_signal(item)
    )
    return list(dict.fromkeys(c for c in ordered if c))
