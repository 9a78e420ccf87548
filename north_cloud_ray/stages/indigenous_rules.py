"""Indigenous-sidecar rule engine — faithful re-expression of the
reference's multilingual rule side
(classifier/internal/classifier/indigenous_rules.go:8-266): core and
peripheral pattern sets spanning English/Spanish/French/Portuguese/
Nordic/Te Reo Māori/Japanese, the 10-category taxonomy with a capped
category confidence bonus, and the core/peripheral/not confidence
formula (0.60 + 0.10/hit capped 0.95; 0.55 peripheral base; 0.60 not).

Pattern tables are DATA shared by the per-row Python kernel and the
SQL-oracle generator in pipelines/queries.py (regexes run verbatim
under DuckDB RE2). Divergence note: the reference truncates the body at
500 BYTES (Go slicing); this port truncates at 500 characters — the two
agree on ASCII text, which is all the oracle inputs use.
"""

from __future__ import annotations

import re

RELEVANCE_CORE_INDIGENOUS = "core_indigenous"
RELEVANCE_PERIPHERAL_INDIGENOUS = "peripheral_indigenous"
RELEVANCE_NOT_INDIGENOUS = "not_indigenous"

CONFIDENCE_CORE_BASE = 0.60
CONFIDENCE_CORE_PER_HIT = 0.10
CONFIDENCE_CORE_MAX = 0.95
CONFIDENCE_PERIPH_BASE = 0.55
CONFIDENCE_CAT_BONUS_PER = 0.03
CONFIDENCE_CAT_BONUS_MAX = 0.10
CONFIDENCE_NOT_INDIGENOUS = 0.60

RULE_MAX_BODY_CHARS = 500
MAX_CATEGORY_EXTRACT = 5

INDIGENOUS_CORE_PATTERNS = (
    # English (Canada / North America)
    r"(?i)\b(anishinaabe|anishinaabemowin|ojibwe|ojibwa|chippewa)\b",
    r"(?i)\b(first nations|indigenous peoples|indigenous community)\b",
    r"(?i)\b(m[eé]tis|metis nation)\b",
    r"(?i)\b(inuit|inuk)\b",
    r"(?i)\b(residential school|treaty rights|land rights|aboriginal)\b",
    r"(?i)\b(seven grandfathers|midewiwin|grand council)\b",
    # English (Oceania)
    r"(?i)\b(m[aā]ori|iwi|hap[uū]|wh[aā]nau)\b",
    r"(?i)\b(aboriginal australian|torres strait islander)\b",
    # English (US / Hawaii)
    r"(?i)\b(native hawaiian|tribal sovereignty|tribal nation)\b",
    # English (Nordic)
    r"(?i)\b(sami people|sámi|saami)\b",
    # Spanish
    r"(?i)\b(pueblos ind[ií]genas|comunidad ind[ií]gena)\b",
    r"(?i)\b(territorio ancestral|derechos ind[ií]genas)\b",
    # French
    r"(?i)\b(peuples autochtones|premi[eè]res nations)\b",
    r"(?i)\b(droits autochtones|communaut[eé] autochtone)\b",
    # Portuguese
    r"(?i)\b(povos ind[ií]genas|terra ind[ií]gena|demarca[cç][aã]o)\b",
    # Nordic (Sami)
    r"(?i)\b(samefolket|urfolk|samisk|s[aá]pmi)\b",
    r"(?i)\b(alkuper[aä]iskansa|ursprungsfolk)\b",
    # Te Reo Māori
    r"(?i)\b(tangata whenua|te tiriti|mana whenua)\b",
    # Japanese (Ainu)
    r"(アイヌ|先住民族|アイヌ民族)",
)

INDIGENOUS_PERIPHERAL_PATTERNS = (
    r"(?i)\b(indigenous|native american|first nation)\b",
    r"(?i)\b(reconciliation|truth and reconciliation)\b",
    r"(?i)\b(reserve|reservation)\b",
    r"(?i)\b(autochtone?)\b",
    r"(?i)\b(ind[ií]gena)\b",
)

INDIGENOUS_CATEGORIES = (
    "culture", "language", "land_rights", "environment", "sovereignty",
    "education", "health", "justice", "history", "community",
)

INDIGENOUS_CATEGORY_KEYWORDS: dict[str, tuple[str, ...]] = {
    "culture": (
        "culture", "ceremony", "powwow", "potlatch", "sweat lodge",
        "corroboree", "haka", "dreamtime", "totem", "regalia",
        "storytelling", "sacred", "cultura", "ceremonia", "ritual",
        "cérémonie", "tradition", "rituel", "cerimônia", "kultur",
        "ceremoni", "tikanga", "whakairo", "kapa haka", "文化", "儀式",
        "伝統",
    ),
    "language": (
        "language", "anishinaabemowin", "indigenous language", "cree",
        "inuktitut", "te reo", "immersion", "language revitalization",
        "lengua indígena", "idioma", "langue autochtone",
        "língua indígena", "språk", "modersmål", "samiska", "reo",
        "te reo māori", "kōrero", "言語", "アイヌ語", "母語",
    ),
    "land_rights": (
        "land rights", "territory", "reserve", "reservation",
        "land claim", "land back", "native title", "dispossession",
        "territorio ancestral", "derechos territoriales",
        "tierras indígenas", "droits fonciers",
        "revendication territoriale", "terra indígena", "demarcação",
        "território", "markrättigheter", "renbetesland", "whenua",
        "mana whenua", "raupatu", "土地権利", "領土",
    ),
    "environment": (
        "environment", "climate", "water rights", "pipeline",
        "deforestation", "conservation", "sacred site", "ecological",
        "medio ambiente", "deforestación", "recursos naturales",
        "environnement", "changement climatique", "meio ambiente",
        "desmatamento", "conservação", "miljö", "klimat",
        "naturresurser", "taiao", "kaitiakitanga", "wai", "環境", "気候",
        "自然保護",
    ),
    "sovereignty": (
        "sovereignty", "self-determination", "self-governance", "treaty",
        "governance", "band council", "grand council",
        "nation-to-nation", "soberanía", "autodeterminación",
        "autogobierno", "souveraineté", "autodétermination",
        "gouvernance", "soberania", "autodeterminação", "governança",
        "suveränitet", "självbestämmande", "tino rangatiratanga",
        "mana motuhake", "主権", "自決権",
    ),
    "education": (
        "education", "residential school", "indigenous education",
        "boarding school", "curriculum", "scholarship", "educación",
        "escuela", "currículo indígena", "éducation", "pensionnat",
        "école autochtone", "educação", "escola indígena", "utbildning",
        "skola", "sameskola", "mātauranga", "kura", "wānanga", "教育",
        "学校",
    ),
    "health": (
        "health", "indigenous health", "traditional medicine",
        "mental health", "healing", "wellness", "salud indígena",
        "medicina tradicional", "santé autochtone",
        "médecine traditionnelle", "saúde indígena", "hälsa",
        "traditionell medicin", "hauora", "rongoā", "健康", "伝統医療",
    ),
    "justice": (
        "justice", "missing and murdered", "incarceration", "police",
        "mmiwg", "inquiry", "legal rights", "discrimination",
        "justicia", "discriminación", "derechos legales",
        "justice autochtone", "enquête", "justiça", "discriminação",
        "direitos", "rättvisa", "diskriminering", "ture", "manatika",
        "正義", "差別",
    ),
    "history": (
        "history", "colonial", "colonization", "decolonization",
        "genocide", "assimilation", "historia", "colonización",
        "descolonización", "histoire", "colonisation", "décolonisation",
        "história", "colonização", "descolonização", "kolonisering",
        "hītori", "whakapapa", "歴史", "植民地",
    ),
    "community": (
        "community", "elders", "youth", "gathering", "assembly",
        "family", "comunidad", "ancianos", "juventud", "asamblea",
        "communauté", "aînés", "jeunesse", "rassemblement",
        "comunidade", "anciãos", "juventude", "gemenskap", "samhälle",
        "whānau", "hapū", "hui", "kaumātua", "コミュニティ", "長老", "集会",
    ),
}

_CORE_RES = tuple(re.compile(p) for p in INDIGENOUS_CORE_PATTERNS)
_PERIPH_RES = tuple(re.compile(p) for p in INDIGENOUS_PERIPHERAL_PATTERNS)


def count_matched_categories(lower: str) -> int:
    """Number of categories with at least one keyword hit, capped at 5
    (indigenous_rules.go countMatchedCategories; the Go map-order early
    break is equivalent to min(total, 5))."""
    count = 0
    for keywords in INDIGENOUS_CATEGORY_KEYWORDS.values():
        if any(kw in lower for kw in keywords):
            count += 1
            if count >= MAX_CATEGORY_EXTRACT:
                break
    return count


def classify_indigenous_rules(title: str, body: str) -> tuple[str, float]:
    """(relevance, confidence) per indigenous_rules.go
    classifyIndigenousByRules."""
    body = body or ""
    text = f"{title or ''} {body[:RULE_MAX_BODY_CHARS]}"
    lower = text.lower()

    core_hits = sum(1 for p in _CORE_RES if p.search(lower))
    cat_bonus = min(CONFIDENCE_CAT_BONUS_MAX,
                    count_matched_categories(lower) * CONFIDENCE_CAT_BONUS_PER)
    if core_hits >= 1:
        conf = CONFIDENCE_CORE_BASE + CONFIDENCE_CORE_PER_HIT * core_hits \
            + cat_bonus
        return RELEVANCE_CORE_INDIGENOUS, min(conf, CONFIDENCE_CORE_MAX)
    if any(p.search(lower) for p in _PERIPH_RES):
        return (RELEVANCE_PERIPHERAL_INDIGENOUS,
                CONFIDENCE_PERIPH_BASE + cat_bonus)
    return RELEVANCE_NOT_INDIGENOUS, CONFIDENCE_NOT_INDIGENOUS
