"""12-type content detection (M8), structured sidecar extractors
(recipe/job/RFP/need-signal) and the gazetteer location classifier (A-tier
"location" sidecar) — the classifier's structured-domain surface.

Reference semantics (re-expressed, not ported):
- crawler/internal/crawler/content_detector.go:14-126,309-386 — URL
  pattern table (first match wins, .pdf => report), JSON-LD @type map,
  og:type fallback; detection priority JSON-LD > URL > og.
- classifier/internal/classifier/content_type_{recipe,job,rfp,
  need_signal}_heuristic.go — keyword heuristics: >=2 case-insensitive
  matches => type at confidence 0.80 ("keyword_heuristic").
- classifier/internal/classifier/recipe_extractor.go:180-320 — section
  parsing ("ingredients:" / "instructions:|directions:|method:|steps:",
  bullet/numbered prefix stripping, blank-line section ends).
- classifier/internal/classifier/need_signal_extractor.go:26-120 —
  signal-type categories, title-delimiter org-name extraction, email.
- classifier/internal/classifier/location.go:25-330 + internal/data/
  canadian_cities.go — capitalized-word gazetteer hits, province/country
  word-boundary patterns, zone weights (headline 3.0 / lede 2.5 / body
  1.0), specificity bonuses (city 3 / province 2 / country 1), 30%
  dominance rule, confidence 0.6..0.95.
- classifier.go:126-150 ResolveSidecars — "article:<subtype>" routing
  with fallback to "article".

Everything here is a pure per-row kernel inside map_batches — no cross-row
state, linear scale-out.
"""

from __future__ import annotations

import json
import math
import re

import pandas as pd

# ---------------- 12-type content detection (M8) ----------------

URL_CONTENT_TYPE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("/press/", "press_release"), ("/media/", "press_release"),
    ("/newsroom/", "press_release"),
    ("/events/", "event"), ("/event/", "event"), ("/calendar/", "event"),
    ("/upcoming/", "event"),
    ("/alert/", "advisory"), ("/alerts/", "advisory"),
    ("/advisory/", "advisory"), ("/advisories/", "advisory"),
    ("/bulletin/", "advisory"), ("/bulletins/", "advisory"),
    ("/reports/", "report"), ("/report/", "report"),
    ("/blotter/", "blotter"), ("/blotters/", "blotter"),
    ("/incidents/", "blotter"), ("/arrests/", "blotter"),
    ("/investors/", "company_announcement"),
    ("/investor/", "company_announcement"),
    ("/updates/", "company_announcement"),
    ("/obituaries/", "obituary"), ("/obituary/", "obituary"),
    ("/obits/", "obituary"),
    ("/recipes/", "recipe"), ("/recipe/", "recipe"), ("/food/", "recipe"),
    ("/jobs/", "job"), ("/careers/", "job"),
    ("/rfp/", "rfp"), ("/rfps/", "rfp"), ("/tenders/", "rfp"),
    ("/tender/", "rfp"), ("/procurement/", "rfp"),
    ("/solicitations/", "rfp"), ("/solicitation/", "rfp"), ("/bids/", "rfp"),
)

JSONLD_TO_DETECTED = {
    "NewsArticle": "article", "Article": "article",
    "BlogPosting": "blog_post", "PressRelease": "press_release",
    "Event": "event", "SpecialAnnouncement": "advisory", "Report": "report",
}


def detect_content_type_from_url(url: str) -> str:
    path = "/" + (url or "").split("://", 1)[-1].partition("/")[2]
    lower = path.split("?", 1)[0].split("#", 1)[0].lower()
    if lower.endswith(".pdf"):
        return "report"
    for pat, ctype in URL_CONTENT_TYPE_PATTERNS:
        if pat in lower:
            return ctype
    return ""


def detect_content_type(url: str, og_type: str = "",
                        jsonld_type: str = "") -> str:
    """content_detector.go:362-376 priority: JSON-LD > URL > og:type."""
    if jsonld_type in JSONLD_TO_DETECTED:
        return JSONLD_TO_DETECTED[jsonld_type]
    from_url = detect_content_type_from_url(url)
    if from_url:
        return from_url
    if og_type.lower() == "article":
        return "article"
    return ""


# ---------------- keyword heuristics (>=2 matches => 0.80) ----------------

MIN_KEYWORD_MATCHES = 2
KEYWORD_HEURISTIC_CONFIDENCE = 0.80

RECIPE_KEYWORDS = ("ingredients", "instructions", "prep time", "cook time",
                   "servings", "preheat", "bake", "simmer", "garnish",
                   "recipe")
JOB_KEYWORDS = ("apply now", "qualifications", "salary", "compensation",
                "job description", "requirements", "responsibilities",
                "full-time", "part-time", "resume", "position available")
EVENT_KEYWORDS = ("register now", "tickets available", "event date",
                  "venue", "admission", "doors open", "rsvp",
                  "keynote speaker", "registration deadline")
EVENT_REPORT_PHRASES = ("scheduled for", "will take place",
                        "lineup announced", "set to perform",
                        "protest planned", "hearing set for",
                        "festival announced", "tournament begins")
OBITUARY_KEYWORDS = ("passed away", "survived by", "predeceased",
                     "in loving memory", "memorial service", "funeral",
                     "obituary", "condolences", "celebration of life",
                     "rest in peace")
OBITUARY_CRIME_SUPPRESSORS = ("police said", "charged with",
                              "investigation", "suspect", "arrested",
                              "under investigation", "crime")
RFP_KEYWORDS = ("request for proposal", "request for tender",
                "request for quotation", "call for tenders",
                "call for proposals", "invitation to tender",
                "solicitation notice", "submission deadline",
                "proposal deadline", "closing date for submissions",
                "procurement", "bid submission", "scope of work")

SIGNAL_CATEGORY_KEYWORDS = {
    "outdated_website": ("drupal 7", "legacy website", "outdated website",
                         "website redesign", "site redesign",
                         "website overhaul", "joomla", "wordpress 4",
                         "end of life", "unsupported platform"),
    "funding_win": ("funding announcement", "grant funding",
                    "receives funding", "awarded grant", "digital capacity",
                    "capital funding", "infrastructure funding",
                    "received grant", "funding approved"),
    "job_posting": ("web developer", "frontend developer",
                    "full stack developer", "seeking a developer",
                    "hiring a developer", "website development",
                    "developer position"),
    "new_program": ("new program launch", "program expansion",
                    "service expansion", "digital strategy",
                    "online presence", "digital transformation",
                    "digital services"),
    "tech_migration": ("site migration", "website migration",
                       "platform migration", "wordpress migration",
                       "joomla migration", "technology modernization",
                       "website modernization", "content management system",
                       "accessibility compliance", "wcag compliance",
                       "web application"),
}
NEED_SIGNAL_KEYWORDS = tuple(
    kw for kws in SIGNAL_CATEGORY_KEYWORDS.values() for kw in kws
)

_INGREDIENT_QTY_RE = re.compile(
    r"\b\d+\s?(?:cups?|tbsp|tablespoons?|tsp|teaspoons?|ml|g|grams|kg|oz|ounces?)\b",
    re.I,
)


def _count_keywords(lower_text: str, keywords) -> int:
    return sum(1 for kw in keywords if kw in lower_text)


_MONTH_DATE_RE = re.compile(
    r"\b(January|February|March|April|May|June|July|August|September|"
    r"October|November|December)\s+\d{1,2},?\s+\d{4}\b", re.I)
_STREET_ADDR_RE = re.compile(
    r"\d+\s+\w+\s+(?:Street|St|Avenue|Ave|Road|Rd|Drive|Dr|Boulevard|Blvd)\b",
    re.I)
_LOCATION_SIGNAL_PHRASES = ("at the", "venue:")


def _has_location_signal(lower_text: str) -> bool:
    """Venue phrase or street-address pattern
    (content_type_event_heuristic.go hasLocationSignal)."""
    if any(p in lower_text for p in _LOCATION_SIGNAL_PHRASES):
        return True
    return bool(_STREET_ADDR_RE.search(lower_text))


def classify_event_from_text(lower_combined: str) -> tuple[str, float, str]:
    """Event detection's three paths
    (content_type_event_heuristic.go classifyFromEventKeywords):
    1. >=2 event keywords -> event
    2. month-name date + location signal -> event
    3. event coverage phrase -> article subtype event_report
    Empty result means no event signal."""
    if _count_keywords(lower_combined, EVENT_KEYWORDS) >= MIN_KEYWORD_MATCHES:
        return "event", KEYWORD_HEURISTIC_CONFIDENCE, "keyword_heuristic"
    if (_MONTH_DATE_RE.search(lower_combined)
            and _has_location_signal(lower_combined)):
        return "event", KEYWORD_HEURISTIC_CONFIDENCE, "keyword_heuristic"
    if any(p in lower_combined for p in EVENT_REPORT_PHRASES):
        return ("event_report", KEYWORD_HEURISTIC_CONFIDENCE,
                "event_report_heuristic")
    return "", 0.0, ""


def classify_obituary_from_text(lower_combined: str) -> tuple[str, float, str]:
    """Obituary detection with crime suppression
    (content_type_obituary_heuristic.go): any crime phrase bails out,
    else >=2 obituary keywords classify at 0.80."""
    if any(s in lower_combined for s in OBITUARY_CRIME_SUPPRESSORS):
        return "", 0.0, ""
    if _count_keywords(lower_combined, OBITUARY_KEYWORDS) >= MIN_KEYWORD_MATCHES:
        return "obituary", KEYWORD_HEURISTIC_CONFIDENCE, "keyword_heuristic"
    return "", 0.0, ""


# ---------------- full content-type cascade (content_type.go) ----------------

PAGINATION_QUERY_PARAMS = ("page", "p", "pagenum", "paged", "page_num",
                           "page_number", "offset", "start", "from")

_READ_MORE_PATTERNS = ("read more", "read more >", "read more>>",
                       "continue reading", "full story")
_LISTING_DATE_PREFIXES = ("jan ", "feb ", "mar ", "apr ", "may ", "jun ",
                          "jul ", "aug ", "sep ", "oct ", "nov ", "dec ")
_LISTING_DATELINES = ("toronto —", "ottawa —", "ontario —",
                      "vancouver —", "montreal —",
                      "calgary —", "edmonton —")
MIN_READ_MORE_FOR_LISTING = 3
MIN_DATES_FOR_LISTING = 5
MIN_SUMMARIES_FOR_LISTING = 3


def _is_numeric(s: str) -> bool:
    """Integer string, optional leading minus (content_type.go isNumeric)."""
    if not s:
        return False
    body = s[1:] if s[0] == "-" else s
    return bool(body) and body.isdigit()


def matches_url_pattern(path: str, pattern: str) -> bool:
    """Prefix match honoring path-segment boundaries
    (content_type.go matchesURLPattern): /classifieds matches
    /classifieds and /classifieds/job-listings but not /classifieds-x."""
    if path == pattern:
        return True
    if pattern.endswith("/"):
        return path.startswith(pattern)
    return path.startswith(pattern + "/")


def _is_exact_section_path(path: str, section: str) -> bool:
    return path == section or path == section + "/"


# content_type.go:36-64 (shared with classify.py's collapsed variant)
ALWAYS_EXCLUDED_PREFIXES = (
    "/account", "/login", "/signin", "/signup", "/register",
    "/ads", "/advertisements", "/directory", "/submissions",
    "/category", "/categories", "/browse", "/listings",
    "/search", "/results",
)
SECTION_INDEX_PATHS = (
    "/news", "/articles", "/stories", "/posts", "/blog",
    "/ontario-news", "/local-news", "/breaking-news",
    "/classifieds", "/classified",
    "/jobs", "/careers", "/employment", "/work-with-us", "/opportunities",
    "/rfp", "/rfps", "/tenders", "/procurement", "/solicitations", "/bids",
)


def _has_pagination_query(query: str) -> bool:
    """Pagination query param with a numeric value
    (content_type.go hasPaginationQuery)."""
    if not query:
        return False
    from urllib.parse import parse_qs
    try:
        values = parse_qs(query, keep_blank_values=True,
                          strict_parsing=False)
    except ValueError:
        lower = query.lower()
        return any(f"{p}=" in lower for p in PAGINATION_QUERY_PARAMS)
    for p in PAGINATION_QUERY_PARAMS:
        if p in values:
            v = values[p][0].strip()
            if v and _is_numeric(v):
                return True
    return False


def is_non_content_url(url: str) -> bool:
    """URL patterns indicating non-article pages
    (content_type.go isNonContentURL): excluded prefixes, exact section
    index paths, redirect/auth query params, pagination params, and the
    homepage."""
    if not url:
        return False
    from urllib.parse import urlsplit
    try:
        parts = urlsplit(url)
    except ValueError:
        return _is_non_content_url_fallback(url)
    path = parts.path.lower()
    if any(matches_url_pattern(path, p) for p in ALWAYS_EXCLUDED_PREFIXES):
        return True
    if any(_is_exact_section_path(path, s) for s in SECTION_INDEX_PATHS):
        return True
    query = parts.query.lower()
    if "returnurl=" in query or "redirect=" in query:
        return True
    if _has_pagination_query(query):
        return True
    return path in ("/", "")


def _is_non_content_url_fallback(url: str) -> bool:
    """Split-free path matching when URL parsing fails
    (content_type.go isNonContentURLFallback)."""
    before_query = url.split("?", 1)[0]
    idx = before_query.find("://")
    rest = before_query[idx + 3:] if idx >= 0 else before_query
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else "/"
    path = path.lower().rstrip("/") or "/"
    if path == "/":
        return True
    if any(matches_url_pattern(path, p) for p in ALWAYS_EXCLUDED_PREFIXES):
        return True
    if any(_is_exact_section_path(path, s) for s in SECTION_INDEX_PATHS):
        return True
    lower = url.lower()
    return "returnurl=" in lower or "redirect=" in lower


def is_listing_page_content(raw_text: str) -> bool:
    """Listing/index page content patterns
    (content_type.go isListingPageContent): 3+ read-more links, 5+
    month-abbreviation dates, or 3+ news datelines."""
    lower = (raw_text or "").lower()
    if sum(lower.count(p) for p in _READ_MORE_PATTERNS) \
            >= MIN_READ_MORE_FOR_LISTING:
        return True
    if sum(lower.count(p) for p in _LISTING_DATE_PREFIXES) \
            >= MIN_DATES_FOR_LISTING:
        return True
    return sum(lower.count(p) for p in _LISTING_DATELINES) \
        >= MIN_SUMMARIES_FOR_LISTING


def classify_content_type_full(
    url: str, *, title: str = "", raw_text: str = "", raw_html: str = "",
    og_type: str = "", word_count: int = 0, meta_description: str = "",
    og_description: str = "", has_published_date: bool = False,
    detected_content_type: str = "",
) -> tuple[str, str, float, str]:
    """The reference's full content-type cascade
    (content_type.go Classify, strategies in order): crawler
    detected_content_type (1.0) -> Schema.org JSON-LD Recipe/JobPosting/
    Event (1.0) -> URL exclusions (page 0.9) -> listing content patterns
    (page 0.85) -> keyword heuristics (0.80) -> OG type (0.78) -> article
    heuristic (0.75) -> relaxed article heuristic (0.65) -> page default
    (0.6). Returns (type, subtype, confidence, method)."""
    if detected_content_type:
        sub = "" if detected_content_type == "article" else detected_content_type
        return "article", sub, 1.0, "detected_content_type"
    if raw_html:
        blocks = _jsonld.extract_blocks(raw_html)
        for schema_type, ctype in (("Recipe", "recipe"),
                                   ("JobPosting", "job"),
                                   ("Event", "event")):
            if _jsonld.find_by_type(blocks, schema_type) is not None:
                return ctype, "", 1.0, "schema_org"
    if is_non_content_url(url):
        return "page", "", 0.9, "url_exclusion"
    if is_listing_page_content(raw_text):
        return "page", "", 0.85, "content_pattern"
    sub, conf, method = classify_subtype_from_text(title, raw_text)
    if sub == "event_report":
        return "article", "event_report", conf, method
    if sub:
        return sub, "", conf, method
    og = (og_type or "").strip().lower()
    if og:
        if og in ("article", "news") or "article" in og:
            return "article", "", 0.78, "og_metadata"
        if og != "website":
            if og == "video" or "video" in og:
                return "video", "", 0.78, "og_metadata"
            if og == "image" or "image" in og:
                return "image", "", 0.78, "og_metadata"
    has_description = bool(meta_description or og_description)
    if (word_count >= 200 and title and has_published_date
            and has_description):
        return "article", "", 0.75, "heuristic"
    if (not has_published_date and word_count >= 300 and title
            and has_description):
        return "article", "", 0.65, "heuristic_relaxed"
    return "page", "", 0.6, "default"


def classify_subtype_from_text(title: str, text: str) -> tuple[str, float, str]:
    """Keyword-heuristic subtype detection in the reference's strategy
    order (content_type.go classifyFromKeywordHeuristics: recipe -> job
    -> event -> obituary -> rfp -> need_signal); first heuristic
    reaching >=2 matches wins at 0.80 confidence."""
    combined = f"{title} {text}".lower()
    recipe_hits = _count_keywords(combined, RECIPE_KEYWORDS)
    if recipe_hits < MIN_KEYWORD_MATCHES and _INGREDIENT_QTY_RE.search(combined):
        recipe_hits += 1
    for name, hits in (
        ("recipe", recipe_hits),
        ("job", _count_keywords(combined, JOB_KEYWORDS)),
    ):
        if hits >= MIN_KEYWORD_MATCHES:
            return name, KEYWORD_HEURISTIC_CONFIDENCE, "keyword_heuristic"
    event = classify_event_from_text(combined)
    if event[0]:
        return event
    obit = classify_obituary_from_text(combined)
    if obit[0]:
        return obit
    for name, hits in (
        ("rfp", _count_keywords(combined, RFP_KEYWORDS)),
        ("need_signal", _count_keywords(combined, NEED_SIGNAL_KEYWORDS)),
    ):
        if hits >= MIN_KEYWORD_MATCHES:
            return name, KEYWORD_HEURISTIC_CONFIDENCE, "keyword_heuristic"
    return "", 0.0, ""


# ---------------- structured extractors ----------------
#
# Two-tier extraction mirrors the reference: tier 1 parses Schema.org
# JSON-LD blocks out of the raw HTML ("schema_org",
# recipe_extractor.go:83-110 / job_extractor.go:88-115); tier 2 falls
# back to text heuristics ("heuristic"). The JSON-LD accessors live in
# stages/jsonld.py.

from . import jsonld as _jsonld

_EMPLOYMENT_TYPE_MAP = {
    "FULL_TIME": "full_time", "PART_TIME": "part_time",
    "CONTRACT": "contract", "TEMPORARY": "temporary",
    "INTERN": "internship", "INTERNSHIP": "internship",
}


def _normalize_employment_type(raw: str) -> str:
    """Schema.org employmentType enum -> normalized lowercase
    (job_extractor.go:163-174); unknown values lowercase as-is."""
    if not raw:
        return ""
    return _EMPLOYMENT_TYPE_MAP.get(raw, raw.lower())


def _recipe_instructions(recipe: dict) -> str:
    """recipeInstructions in its three Schema.org shapes: plain string,
    array of strings, array of HowToStep objects (recipe_extractor.go
    extractInstructions); steps join with a single space."""
    raw = recipe.get("recipeInstructions")
    if isinstance(raw, str):
        return raw
    if not isinstance(raw, list):
        return ""
    steps = []
    for elem in raw:
        if isinstance(elem, str):
            steps.append(elem)
        elif isinstance(elem, dict):
            text = _jsonld.string_val(elem, "text")
            if text:
                steps.append(text)
    return " ".join(steps)


def _jsonld_image_url(obj: dict) -> str:
    """image as string or {"url": ...} object (extractImageURL)."""
    raw = obj.get("image")
    if isinstance(raw, str):
        return raw
    if isinstance(raw, dict):
        return _jsonld.string_val(raw, "url")
    return ""


def extract_recipe_schema_org(html: str) -> dict | None:
    """Tier-1 Recipe extraction from JSON-LD (recipe_extractor.go:83-123).
    Returns None when no Recipe block exists."""
    recipe = _jsonld.find_by_type(_jsonld.extract_blocks(html), "Recipe")
    if recipe is None:
        return None
    out: dict = {
        "extraction_method": "schema_org",
        "name": _jsonld.string_val(recipe, "name"),
        "ingredients": _jsonld.string_slice_val(recipe, "recipeIngredient") or [],
        "instructions": _recipe_instructions(recipe),
        "prep_time_minutes": _jsonld.parse_iso8601_duration(
            _jsonld.string_val(recipe, "prepTime")),
        "cook_time_minutes": _jsonld.parse_iso8601_duration(
            _jsonld.string_val(recipe, "cookTime")),
        "total_time_minutes": _jsonld.parse_iso8601_duration(
            _jsonld.string_val(recipe, "totalTime")),
        "servings": _jsonld.string_val(recipe, "recipeYield"),
        "category": _jsonld.string_val(recipe, "recipeCategory"),
        "cuisine": _jsonld.string_val(recipe, "recipeCuisine"),
        "calories": _jsonld.nested_string_val(recipe, "nutrition", "calories"),
        "image_url": _jsonld_image_url(recipe),
        "rating": None, "rating_count": None,
    }
    rating = recipe.get("aggregateRating")
    if isinstance(rating, dict):
        out["rating"] = _jsonld.float_val(rating, "ratingValue")
        out["rating_count"] = _jsonld.int_val(rating, "ratingCount")
    return out


def _job_location(job: dict) -> str:
    """jobLocation.address -> "City, Region" (extractJobLocation)."""
    loc = job.get("jobLocation")
    if not isinstance(loc, dict):
        return ""
    addr = loc.get("address")
    if not isinstance(addr, dict):
        return ""
    city = _jsonld.string_val(addr, "addressLocality")
    region = _jsonld.string_val(addr, "addressRegion")
    if city and region:
        return f"{city}, {region}"
    return city or region


def extract_job_schema_org(html: str) -> dict | None:
    """Tier-1 JobPosting extraction from JSON-LD
    (job_extractor.go:88-160). Returns None when no JobPosting block."""
    job = _jsonld.find_by_type(_jsonld.extract_blocks(html), "JobPosting")
    if job is None:
        return None
    out: dict = {
        "extraction_method": "schema_org",
        "title": _jsonld.string_val(job, "title"),
        "company": _jsonld.nested_string_val(job, "hiringOrganization", "name"),
        "location": _job_location(job),
        "employment_type": _normalize_employment_type(
            _jsonld.string_val(job, "employmentType")),
        "posted_date": _jsonld.string_val(job, "datePosted"),
        "expires_date": _jsonld.string_val(job, "validThrough"),
        "description": _jsonld.string_val(job, "description"),
        "industry": _jsonld.string_val(job, "industry"),
        "qualifications": _jsonld.string_val(job, "qualifications"),
        "benefits": _jsonld.string_val(job, "jobBenefits"),
        "salary_currency": "", "salary_min": None, "salary_max": None,
    }
    salary = job.get("baseSalary")
    if isinstance(salary, dict):
        out["salary_currency"] = _jsonld.string_val(salary, "currency")
        value = salary.get("value")
        if isinstance(value, dict):
            out["salary_min"] = _jsonld.float_val(value, "minValue")
            out["salary_max"] = _jsonld.float_val(value, "maxValue")
    return out


_INGREDIENT_HEADERS = ("ingredients:",)
_INSTRUCTION_HEADERS = ("instructions:", "directions:", "method:", "steps:")
_BULLETS = ("- ", "* ", "• ")
_NUMBERED_RE = re.compile(r"^\d+\.\s+")
_TIME_RE = re.compile(r"(prep|cook|total)\s*time:?\s*(\d+)\s*(?:min|minutes)", re.I)
_SERVINGS_RE = re.compile(r"(?:servings|serves|yield):?\s*(\d+(?:\s*-\s*\d+)?)", re.I)


def _find_section(raw: str, lower: str, headers) -> str:
    idx = -1
    for h in headers:
        i = lower.find(h)
        if i >= 0:
            idx = i
            break
    if idx < 0:
        return ""
    nl = raw.find("\n", idx)
    if nl < 0:
        return ""
    start = nl + 1
    end = raw.find("\n\n", start)
    return raw[start:end if end >= 0 else len(raw)]


def extract_recipe(title: str, text: str, html: str = "") -> dict | None:
    """Recipe extraction: tier-1 Schema.org JSON-LD when HTML is
    available, tier-2 section-header heuristics over the text
    (recipe_extractor.go:47-80 tiering, :180-320 heuristic)."""
    if html:
        result = extract_recipe_schema_org(html)
        if result is not None:
            return result
    lower = text.lower()
    section = _find_section(text, lower, _INGREDIENT_HEADERS)
    ingredients = []
    for line in section.split("\n"):
        s = line.strip()
        if not s:
            continue
        for b in _BULLETS:
            if s.startswith(b):
                s = s[len(b):].strip()
                break
        else:
            s = _NUMBERED_RE.sub("", s)
        if s:
            ingredients.append(s)
    instructions = _find_section(text, lower, _INSTRUCTION_HEADERS).strip()
    if not ingredients and not instructions:
        return None
    out: dict = {"extraction_method": "heuristic", "name": title,
                 "ingredients": ingredients, "instructions": instructions}
    for m in _TIME_RE.finditer(text):
        out[f"{m.group(1).lower()}_time_minutes"] = int(m.group(2))
    sm = _SERVINGS_RE.search(text)
    if sm:
        out["servings"] = sm.group(1)
    return out


_SALARY_RE = re.compile(
    r"\$\s?([\d,]+(?:\.\d+)?)\s*(?:-|to)\s*\$?\s?([\d,]+(?:\.\d+)?)", re.I)
_EMPLOYMENT_TYPES = (("full-time", "full_time"), ("full time", "full_time"),
                     ("part-time", "part_time"), ("part time", "part_time"),
                     ("contract", "contract"), ("temporary", "temporary"),
                     ("internship", "internship"))


def extract_job(title: str, text: str, html: str = "") -> dict | None:
    """Job extraction: tier-1 Schema.org JSON-LD when HTML is available,
    tier-2 keyword-gated text heuristics (job_extractor.go:50-86)."""
    if html:
        result = extract_job_schema_org(html)
        if result is not None:
            return result
    lower = text.lower()
    cm = re.search(r"(?:company|employer|organization):\s*([^\n]+)", text, re.I)
    lm = re.search(r"location:\s*([^\n]+)", text, re.I)
    quals = _find_section(
        text, lower, ("requirements:", "qualifications:")).strip()
    # Reference gate (job_extractor.go:185-200): nil when no labeled
    # company/location line and no qualifications section were found;
    # the keyword gate additionally admits salary/employment-only pages.
    if not (cm or lm or quals) and _count_keywords(
            f"{title} {text}".lower(), JOB_KEYWORDS) < MIN_KEYWORD_MATCHES:
        return None
    out: dict = {"extraction_method": "heuristic", "title": title}
    sm = _SALARY_RE.search(text)
    if sm:
        out["salary_min"] = float(sm.group(1).replace(",", ""))
        out["salary_max"] = float(sm.group(2).replace(",", ""))
        out["salary_currency"] = "CAD"
    for marker, etype in _EMPLOYMENT_TYPES:
        if marker in lower:
            out["employment_type"] = etype
            break
    if cm:
        out["company"] = cm.group(1).strip()
    if lm:
        out["location"] = lm.group(1).strip()
    if quals:
        out["qualifications"] = quals
    return out


_REFNUM_RE = re.compile(
    r"(?:reference|ref\.?|solicitation|tender)\s*(?:no\.?|number|#):?\s*([A-Z0-9][\w/-]+)",
    re.I)
_CLOSING_RE = re.compile(
    r"(?:closing date|submission deadline|proposal deadline|closes?)[:\s]+"
    r"(\d{4}-\d{2}-\d{2}|\w+ \d{1,2},? \d{4})", re.I)
_BUDGET_RE = re.compile(
    r"budget[:\s]+\$\s?([\d,]+)(?:\s*(?:-|to)\s*\$?\s?([\d,]+))?", re.I)


def extract_rfp(title: str, text: str, url: str = "") -> dict | None:
    lower = f"{title} {text}".lower()
    if _count_keywords(lower, RFP_KEYWORDS) < MIN_KEYWORD_MATCHES:
        return None
    doc_type = ""
    if "notice to industry" in lower or "proactive disclosure" in lower:
        doc_type = "notice"
    elif "request for information" in lower or re.search(r"\brfi\b", lower):
        doc_type = "rfi"
    out: dict = {"extraction_method": "heuristic", "title": title,
                 "document_type": doc_type, "source_url": url}
    rm = _REFNUM_RE.search(text)
    if rm:
        out["reference_number"] = rm.group(1)
    cm = _CLOSING_RE.search(text)
    if cm:
        out["closing_date"] = cm.group(1)
    bm = _BUDGET_RE.search(text)
    if bm:
        out["budget_min"] = float(bm.group(1).replace(",", ""))
        if bm.group(2):
            out["budget_max"] = float(bm.group(2).replace(",", ""))
        out["budget_currency"] = "CAD"
    return out


_EMAIL_RE = re.compile(r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}")
_TITLE_DELIMS = (" - ", " | ", ": ", " announces ", " receives ",
                 " awarded ", " launches ")


def extract_need_signal(title: str, text: str, url: str = "") -> dict | None:
    combined = f"{title} {text}".lower()
    best_type, best_hits, matched = "", 0, []
    for stype, kws in SIGNAL_CATEGORY_KEYWORDS.items():
        hits = [kw for kw in kws if kw in combined]
        if len(hits) > best_hits:
            best_type, best_hits, matched = stype, len(hits), hits
    if _count_keywords(combined, NEED_SIGNAL_KEYWORDS) < MIN_KEYWORD_MATCHES:
        return None
    org = title
    for d in _TITLE_DELIMS:
        if d in org:
            org = org.split(d)[0]
            break
    em = _EMAIL_RE.search(text)
    email = em.group(0) if em else ""
    from .org_normalize import resolve as _resolve_org

    return {
        "signal_type": best_type or "new_program",
        "organization_name": org.strip(),
        # attribution fallback chain explicit -> email -> url
        # (need_signal_extractor.go:107-117, org_normalize.go Resolve)
        "organization_name_normalized": _resolve_org(org.strip(), email, url),
        "contact_email": email,
        "source_url": url,
        "keywords": matched,
        "confidence": KEYWORD_HEURISTIC_CONFIDENCE,
    }


def slugify(s: str) -> str:
    """Canonical slug form (publisher/ARCHITECTURE.md:204,231,270 +
    canadian_cities.go toSlug): lowercase, spaces/underscores/dots ->
    hyphens, strip everything else, collapse repeats."""
    s = re.sub(r"[\s_.]+", "-", (s or "").strip().lower())
    s = re.sub(r"[^a-z0-9-]", "", s)
    return re.sub(r"-{2,}", "-", s).strip("-")


# ---------------- gazetteer location classifier ----------------

# Major Canadian cities (public facts: StatCan census metropolitan areas),
# the same data family the reference curates in data/canadian_cities.go.
CANADIAN_CITIES: dict[str, str] = {
    # Ontario
    "toronto": "ON", "ottawa": "ON", "mississauga": "ON", "brampton": "ON",
    "hamilton": "ON", "london": "ON", "markham": "ON", "vaughan": "ON",
    "kitchener": "ON", "windsor": "ON", "sudbury": "ON", "barrie": "ON",
    "guelph": "ON", "kingston": "ON", "oshawa": "ON", "waterloo": "ON",
    "peterborough": "ON", "timmins": "ON",
    # Quebec
    "montreal": "QC", "quebec city": "QC", "laval": "QC", "gatineau": "QC",
    "longueuil": "QC", "sherbrooke": "QC", "saguenay": "QC",
    "trois-rivieres": "QC",
    # British Columbia
    "vancouver": "BC", "surrey": "BC", "burnaby": "BC", "richmond": "BC",
    "victoria": "BC", "kelowna": "BC", "kamloops": "BC", "nanaimo": "BC",
    "abbotsford": "BC", "coquitlam": "BC",
    # Alberta
    "calgary": "AB", "edmonton": "AB", "red deer": "AB", "lethbridge": "AB",
    "fort mcmurray": "AB", "grande prairie": "AB",
    # Prairies
    "winnipeg": "MB", "brandon": "MB", "saskatoon": "SK", "regina": "SK",
    "moose jaw": "SK",
    # Atlantic
    "halifax": "NS", "sydney": "NS", "moncton": "NB", "fredericton": "NB",
    "saint john": "NB", "charlottetown": "PE", "st. john's": "NL",
    # North
    "whitehorse": "YT", "yellowknife": "NT", "iqaluit": "NU",
}
# multi-word city names need phrase matching alongside single-word hits
_MULTIWORD_CITIES = {c: p for c, p in CANADIAN_CITIES.items() if " " in c}

PROVINCE_PATTERNS = {
    r"\bontario\b": "ON", r"\bquebec\b": "QC", r"\bbritish columbia\b": "BC",
    r"\balberta\b": "AB", r"\bmanitoba\b": "MB", r"\bsaskatchewan\b": "SK",
    r"\bnova scotia\b": "NS", r"\bnew brunswick\b": "NB",
    r"\bnewfoundland\b": "NL", r"\bprince edward island\b": "PE",
    r"\bnorthwest territories\b": "NT", r"\byukon\b": "YT", r"\bnunavut\b": "NU",
}
# location.go:98-108 verbatim (incl. the case-insensitive \bus\b quirk:
# the pronoun "us" scores united_states in the reference too)
COUNTRY_PATTERNS = {
    r"\bcanada\b": "canada", r"\bcanadian\b": "canada",
    r"\bunited states\b": "united_states", r"\bu\.s\.\b": "united_states",
    r"\bus\b": "united_states", r"\bu\.s\.a\.\b": "united_states",
    r"\busa\b": "united_states", r"\bamerican?\b": "united_states",
}
_PROVINCE_RES = {re.compile(p, re.I): c for p, c in PROVINCE_PATTERNS.items()}
_COUNTRY_RES = {re.compile(p, re.I): c for p, c in COUNTRY_PATTERNS.items()}
_CAP_WORD_RE = re.compile(r"\b([A-Z][a-z]+)\b")

HEADLINE_WEIGHT, LEDE_WEIGHT, BODY_WEIGHT = 3.0, 2.5, 1.0
CITY_BONUS, PROVINCE_BONUS, COUNTRY_BONUS = 3, 2, 1
DOMINANCE_THRESHOLD = 0.30
AMBIGUOUS_CONF, HIGH_CONF, BASE_CONF, CONF_RANGE = 0.5, 0.95, 0.6, 0.35


def _extract_entities(text: str) -> list[tuple[str, str, str]]:
    """(entity_type, normalized, province) mentions in one text zone."""
    out, seen = [], set()
    lower = text.lower()
    for w in _CAP_WORD_RE.findall(text):
        n = w.lower()
        if n in seen or n not in CANADIAN_CITIES:
            continue
        seen.add(n)
        out.append(("city", n.replace(" ", "-"), CANADIAN_CITIES[n]))
    for phrase, prov in _MULTIWORD_CITIES.items():
        if phrase in lower and phrase not in seen:
            seen.add(phrase)
            out.append(("city", phrase.replace(" ", "-").replace(".", ""), prov))
    for rex, code in _PROVINCE_RES.items():
        if rex.search(text) and ("province:" + code) not in seen:
            seen.add("province:" + code)
            out.append(("province", code, ""))
    for rex, country in _COUNTRY_RES.items():
        if rex.search(text) and ("country:" + country) not in seen:
            seen.add("country:" + country)
            out.append(("country", country, ""))
    return out


def classify_location(title: str, text: str) -> dict:
    """location.go:188-330: weighted zone scoring + 30% dominance rule."""
    lede = text.split("\n\n", 1)[0][:500]
    scores: dict[str, list] = {}
    for zone, weight in ((title, HEADLINE_WEIGHT), (lede, LEDE_WEIGHT),
                         (text, BODY_WEIGHT)):
        for etype, norm, prov in _extract_entities(zone):
            bonus = {"city": CITY_BONUS, "province": PROVINCE_BONUS,
                     "country": COUNTRY_BONUS}[etype]
            key = f"{etype}:{norm}"
            if key in scores:
                scores[key][0] += weight * bonus
            else:
                scores[key] = [weight * bonus, etype, norm, prov]
    unknown = {"city": "", "province": "", "country": "unknown",
               "specificity": "unknown", "confidence": 0.0}
    if not scores:
        return unknown
    ranked = sorted(scores.values(), key=lambda s: -s[0])
    first = ranked[0]
    second = ranked[1] if len(ranked) > 1 else None
    if second is not None:
        margin = (first[0] - second[0]) / first[0]
        if margin < DOMINANCE_THRESHOLD:
            return {**unknown, "confidence": AMBIGUOUS_CONF}
        conf = BASE_CONF + (margin - DOMINANCE_THRESHOLD) / (
            1 - DOMINANCE_THRESHOLD) * CONF_RANGE
    else:
        conf = HIGH_CONF
    _, etype, norm, prov = first
    if etype == "city":
        return {"city": norm, "province": prov, "country": "canada",
                "specificity": "city", "confidence": conf}
    if etype == "province":
        return {"city": "", "province": norm, "country": "canada",
                "specificity": "province", "confidence": conf}
    return {"city": "", "province": "", "country": norm,
            "specificity": "country", "confidence": conf}


# ---------------- ICP sector alignment (infrastructure/icp/matcher.go) ----

ICP_MODEL_VERSION = "v1"

# Deterministic seed mirroring the shape of the reference's three canonical
# segments (icp/seed.go ValidateSeed requires exactly these names;
# source-manager/data/icp-segments.yml is the data model). Terms abridged.
ICP_SEGMENTS: tuple[dict, ...] = (
    {
        "name": "indigenous_channel",
        "keywords": ("first nation", "first nations", "indigenous",
                     "indigenous business", "band council", "tribal council",
                     "metis nation", "inuit", "economic development corporation",
                     "impact benefit agreement"),
        "topics": ("indigenous",),
        "required_any": ("first nation", "indigenous", "metis", "inuit",
                         "treaty", "band council", "tribal council",
                         "ontario", "canada", "canadian", "anishinaabe",
                         "cree", "ojibwe"),
        "min_score": 0.08,
    },
    {
        "name": "northern_ontario_industry",
        "keywords": ("northern ontario", "sudbury", "thunder bay", "timmins",
                     "north bay", "algoma", "manitoulin", "mining", "mine",
                     "nickel", "forestry", "sawmill", "hydro", "municipality",
                     "municipal"),
        "topics": ("mining", "energy"),
        "required_any": (),
        "min_score": 0.30,
    },
    {
        "name": "private_sector_smb",
        "keywords": ("law firm", "accounting firm", "consulting firm",
                     "saas startup", "bootstrapped", "family-owned",
                     "small business", "canadian company", "privately held",
                     "professional services firm"),
        "topics": ("business", "technology"),
        "required_any": (),
        "min_score": 0.30,
    },
)


def match_icp(title: str, body: str, source_name: str = "", url: str = "",
              topics=(), segments: tuple[dict, ...] = ICP_SEGMENTS) -> dict | None:
    """Sector-alignment matcher (icp/matcher.go:28-120): per segment,
    required_any gate -> keyword substring + topic matches -> score
    1.5*kw_frac (cap .85) + 0.5*topic_frac (cap .30) + 0.10 if >=3 kw hits,
    capped at 1, rounded half-up to 2dp, kept when >= min_score. Returns
    {"segments": [...score desc, name asc...], "model_version": "v1"} or
    None when nothing matches."""
    text = " ".join([title or "", body or "", source_name or "",
                     url or ""]).lower()
    doc_topics = {str(t).lower() for t in topics}
    matches = []
    for seg in segments:
        req = seg["required_any"]
        if req and not any(t in text for t in req):
            continue
        kw_hits = [k for k in seg["keywords"] if k in text]
        tp_hits = ["topic:" + t for t in seg["topics"] if t in doc_topics]
        if not kw_hits and not tp_hits:
            continue
        kscore = min(len(kw_hits) / max(len(seg["keywords"]), 1) * 1.5, 0.85)
        tscore = min(len(tp_hits) / max(len(seg["topics"]), 1) * 0.5, 0.30)
        score = kscore + tscore
        if len(kw_hits) >= 3:
            score += 0.10
        score = min(score, 1.0)
        score = math.floor(score * 100 + 0.5) / 100  # Go math.Round half-up
        if score < seg["min_score"]:
            continue
        matches.append({"segment": seg["name"], "score": score,
                        "matched_keywords": sorted(kw_hits + tp_hits)})
    if not matches:
        return None
    matches.sort(key=lambda m: (-m["score"], m["segment"]))
    return {"segments": matches, "model_version": ICP_MODEL_VERSION}


# ---------------- sidecar routing (J5, ResolveSidecars) ----------------

# The reference's default routing (config.go getDefaultRouting) plus the
# structured-extractor rows this engine adds for recipe/job/rfp/
# need_signal subtypes (the reference gates those extractors by content
# type/topics inside each extractor instead).
ROUTING_TABLE: dict[str, tuple[str, ...]] = {
    "article": ("crime", "mining", "coforge", "entertainment",
                "indigenous", "location"),
    "article:event": ("location",),
    "article:event_report": ("location",),
    "article:blotter": ("crime",),
    "article:report": (),
    "article:recipe": ("recipe",),
    "article:job": ("job", "location"),
    "article:rfp": ("rfp", "location"),
    "article:need_signal": ("need_signal", "location"),
    "article:obituary": ("location",),
    "page": (),
    "listing": (),
}


def resolve_sidecars(content_type: str, subtype: str = "",
                     table: dict[str, tuple[str, ...]] | None = None,
                     ) -> tuple[str, ...]:
    """classifier.go:126-150: article:<subtype> first, then article, then
    the bare content type; unknown keys run nothing."""
    table = ROUTING_TABLE if table is None else table
    if content_type == "article" and subtype:
        key = f"article:{subtype}"
        if key in table:
            return table[key]
        return table.get("article", ())
    return table.get(content_type, ())


# ---------------- Ray stage ----------------

class StructuredExtractStage:
    """map_batches stage over classified doc rows (doc_id, url, title,
    body, content_type): detects the 12-type subtype, routes to the
    structured extractors per the routing table, and emits the nested
    results as JSON-string columns (Arrow-stable schema)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        subtypes, methods, recipes, jobs, rfps, signals, locations, icps = \
            [], [], [], [], [], [], [], []
        sources = (batch["source_id"] if "source_id" in batch.columns
                   else pd.Series([""] * len(batch)))
        topics_col = (batch["topics"] if "topics" in batch.columns
                      else pd.Series([()] * len(batch)))
        html_col = (batch["html"] if "html" in batch.columns
                    else pd.Series([""] * len(batch)))
        for url, title, body, ctype, src, tps, html in zip(
                batch["url"], batch["title"], batch["body"],
                batch["content_type"], sources, topics_col, html_col):
            title, body, html = title or "", body or "", html or ""
            sub = detect_content_type_from_url(url)
            method = "url_pattern" if sub else ""
            if not sub:
                sub, _, method = classify_subtype_from_text(title, body)
            subtypes.append(sub)
            methods.append(method)
            sidecars = resolve_sidecars(ctype, sub)
            recipes.append(json.dumps(extract_recipe(title, body, html))
                           if "recipe" in sidecars else "null")
            jobs.append(json.dumps(extract_job(title, body, html))
                        if "job" in sidecars else "null")
            rfps.append(json.dumps(extract_rfp(title, body, url))
                        if "rfp" in sidecars else "null")
            signals.append(json.dumps(extract_need_signal(title, body, url))
                           if "need_signal" in sidecars else "null")
            locations.append(json.dumps(classify_location(title, body))
                             if "location" in sidecars else "null")
            # ICP sector alignment runs for every doc (classifier.go:202
            # runSectorAlignment is not routing-table gated)
            if isinstance(tps, str):
                tps = [t for t in tps.split(",") if t]
            elif tps is None or (
                    not hasattr(tps, "__iter__") and pd.isna(tps)):
                tps = ()  # scalar NaN (e.g. from a join) is "no topics"
            icps.append(json.dumps(match_icp(
                title, body, source_name=src or "", url=url, topics=tps)))
        out = batch[["doc_id", "url", "content_type"]].copy()
        out["content_subtype"] = subtypes
        out["subtype_method"] = methods
        out["recipe"] = recipes
        out["job"] = jobs
        out["rfp"] = rfps
        out["need_signal"] = signals
        out["location"] = locations
        out["icp"] = icps
        return out
