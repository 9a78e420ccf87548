"""Real HTML extraction chain (M11-M15) — selector -> CMS template ->
fallback containers -> text-density scoring -> readability fallback, plus
metadata/JSON-LD extraction and page-type classification.

Re-implements, Ray-Data-first and stdlib-only (html.parser mini-DOM, no
goquery/readability deps), the reference semantics of:
- crawler/internal/content/rawcontent/extractor_html.go:16-120 (selector
  chain, excludes, fallback containers, text-density heuristic)
- extractor_metadata.go:13-267 (meta/OG tags, canonical, author + date
  fallback chains)
- extractor_jsonld.go:28-563 (typed JSON-LD dispatch + variant
  normalization)
- templates.go:121-193 (CMS template registry: hint > domain > HTML
  detection)
- readability_fallback.go:16-35 (fallback when selector extraction is
  negligible; approximated with an Arc90-style paragraph scorer)
- page_type.go:14-126 (article/listing/stub/other scoring)

Distribution shape: ``extract_pages`` is a pure per-batch kernel —
``map_batches(ExtractHtmlStage, concurrency=N)`` over (url, html) batches;
no cross-row state, so it scales linearly with the cluster.
"""

from __future__ import annotations

import json
import re
from html import unescape
from html.parser import HTMLParser

import pandas as pd

# ---------------- mini-DOM ----------------

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node or str
        self.parent = parent

    # raw concatenated text of all descendant text nodes
    def text(self) -> str:
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in ("script", "style"):
                stack.extend(reversed(c.children))
        return "".join(out)

    def clean_text(self) -> str:
        return " ".join(self.text().split())

    def iter_nodes(self):
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if not isinstance(c, str):
                yield c
                stack.extend(reversed(c.children))

    def remove_child_trees(self, targets: set) -> None:
        """Remove every node in ``targets`` (and its subtree) from under
        this node."""
        self.children = [
            c for c in self.children if isinstance(c, str) or c not in targets
        ]
        for c in self.children:
            if not isinstance(c, str):
                c.remove_child_trees(targets)

    def inner_html(self) -> str:
        out: list[str] = []
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                attrs = "".join(
                    f' {k}="{v}"' for k, v in c.attrs.items() if v is not None
                )
                if c.tag in _VOID_TAGS:
                    out.append(f"<{c.tag}{attrs}/>")
                else:
                    out.append(f"<{c.tag}{attrs}>{c.inner_html()}</{c.tag}>")
        return "".join(out)


class _TreeBuilder(HTMLParser):
    # block tags that implicitly close an open <p> (forgiving real-web HTML)
    _P_CLOSERS = frozenset(
        "p div section article main ul ol table h1 h2 h3 h4 h5 h6 nav aside "
        "header footer blockquote".split()
    )

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag == "p" or tag in self._P_CLOSERS:
            # implicit </p> when a block element opens inside a <p>
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
                if self.stack[i].tag in self._P_CLOSERS:
                    break
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_dom(html: str) -> Node:
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


# ---------------- selector engine ----------------
# supports: tag, .class, #id, [attr], [attr='v'], compounds (h1.title,
# meta[name='x']), descendant combinator (".byline time"), comma lists.

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*)?"
    r"(?P<cls>(?:\.[\w-]+)*)"
    r"(?P<id>#[\w-]+)?"
    r"(?P<attrs>(?:\[[^\]]+\])*)$"
)
_ATTR_RE = re.compile(r"\[\s*([\w:-]+)\s*(?:=\s*(?:'([^']*)'|\"([^\"]*)\"|([^\]\s]+)))?\s*\]")


def _compile_simple(sel: str):
    m = _SIMPLE_RE.match(sel.strip())
    if not m:
        return None
    tag = (m.group("tag") or "").lower() or None
    classes = [c for c in (m.group("cls") or "").split(".") if c]
    node_id = (m.group("id") or "")[1:] or None
    attrs = []
    for am in _ATTR_RE.finditer(m.group("attrs") or ""):
        name = am.group(1).lower()
        val = am.group(2) if am.group(2) is not None else (
            am.group(3) if am.group(3) is not None else am.group(4))
        attrs.append((name, val))
    return (tag, classes, node_id, attrs)


def _match_simple(node: Node, compiled) -> bool:
    tag, classes, node_id, attrs = compiled
    if tag and node.tag != tag:
        return False
    if classes:
        have = (node.attrs.get("class") or "").split()
        if any(c not in have for c in classes):
            return False
    if node_id and node.attrs.get("id") != node_id:
        return False
    for name, val in attrs:
        got = node.attrs.get(name)
        if got is None:
            return False
        if val is not None and got != val:
            return False
    return True


def select(root: Node, selector: str) -> list[Node]:
    """All nodes matching the (possibly comma-separated) selector, in
    document order."""
    out: list[Node] = []
    seen: set = set()
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        parts = [p for p in alt.split() if p]
        compiled = [_compile_simple(p) for p in parts]
        if any(c is None for c in compiled):
            continue
        scopes = [root]
        for i, comp in enumerate(compiled):
            found: list[Node] = []
            for scope in scopes:
                for n in scope.iter_nodes():
                    if _match_simple(n, comp):
                        found.append(n)
            scopes = found
        for n in scopes:
            if id(n) not in seen:
                seen.add(id(n))
                out.append(n)
    return out


def select_first(root: Node, selector: str) -> Node | None:
    for alt in selector.split(","):
        got = select(root, alt)
        if got:
            return got[0]
    return None


# ---------------- extraction chain (extractor_html.go) ----------------

MIN_HTML_CONTENT_LENGTH = 50
MIN_PARAGRAPH_LENGTH = 20
TEXT_DENSITY_MIN_CHARS = 200
ANCESTOR_SCORE_THRESHOLD = 0.8

FALLBACK_SELECTORS = [
    "article", "main", ".content", ".post-content", ".entry-content",
    "[role='main']", "[role='article']",
]

NON_CONTENT_REMOVE = (
    "header, footer, nav, aside, .header, .footer, .navigation, .sidebar, "
    ".menu, script, style"
)

DENSITY_NOISE_FRAGMENTS = [
    "nav", "menu", "sidebar", "header", "footer", "ad-", "banner",
    "promo", "comment", "social", "related", "widget",
]


def _apply_excludes(container: Node, exclude_selectors) -> None:
    targets: set = set()
    for exc in exclude_selectors or ():
        if exc:
            targets.update(select(container, exc))
    if targets:
        container.remove_child_trees(targets)


def _is_density_noise(node: Node) -> bool:
    combined = ((node.attrs.get("class") or "") + " "
                + (node.attrs.get("id") or "")).lower()
    tokens = re.split(r"[\s_-]+", combined)
    for frag in DENSITY_NOISE_FRAGMENTS:
        for tok in tokens:
            if tok and (tok == frag or tok.startswith(frag)):
                return True
    return False


def _is_descendant_of(child: Node, ancestor: Node) -> bool:
    p = child.parent
    while p is not None:
        if p is ancestor:
            return True
        p = p.parent
    return False


def find_densest_element(root: Node) -> Node | None:
    """extractor_html.go:245-299: score div/section/article/main elements
    by (non-link content length)^2 / total length; prefer a child scoring
    >= 80% of its ancestor."""
    body = select_first(root, "body")
    if body is None:
        return None
    best, best_score = None, 0.0
    for n in body.iter_nodes():
        if n.tag not in ("div", "section", "article", "main"):
            continue
        if _is_density_noise(n):
            continue
        total_text = n.clean_text()
        total = len(total_text)
        if total < TEXT_DENSITY_MIN_CHARS:
            continue
        link_len = sum(
            len(a.clean_text()) for a in n.iter_nodes() if a.tag == "a"
        )
        content = total - link_len
        if content <= 0:
            continue
        score = float(content) * content / total
        if best is None or score > best_score:
            best, best_score = n, score
        elif score >= best_score * ANCESTOR_SCORE_THRESHOLD and _is_descendant_of(n, best):
            best, best_score = n, score
    return best


def _text_from_selector(root: Node, selector: str, excludes) -> str:
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        container = select_first(root, alt)
        if container is None:
            continue
        _apply_excludes(container, excludes)
        text = container.clean_text()
        if text:
            return text
    return ""


def _body_paragraphs_text(root: Node, excludes) -> str:
    body = select_first(root, "body")
    if body is None:
        return ""
    _apply_excludes(body, [NON_CONTENT_REMOVE] + list(excludes or ()))
    paras = [n for n in body.iter_nodes() if n.tag == "p"]
    if not paras:
        return body.clean_text()
    parts = [p.clean_text() for p in paras]
    parts = [p for p in parts if len(p) > MIN_PARAGRAPH_LENGTH]
    if not parts:
        return body.clean_text()
    return "\n\n".join(parts)


def extract_raw_text(root: Node, container_selector: str = "",
                     body_selector: str = "",
                     exclude_selectors=()) -> tuple[str, str]:
    """The full extractRawText chain. Returns (text, method) where method
    mirrors the reference's extraction-method metric labels
    (quality_metrics.go:8-13)."""
    if container_selector:
        t = _text_from_selector(root, container_selector, exclude_selectors)
        if t:
            return t, "selector"
    if body_selector:
        t = _text_from_selector(root, body_selector, exclude_selectors)
        if t:
            return t, "selector"
    for sel in FALLBACK_SELECTORS:
        t = _text_from_selector(root, sel, exclude_selectors)
        if t and len(t) > MIN_HTML_CONTENT_LENGTH:
            return t, "heuristic"
    best = find_densest_element(root)
    if best is not None:
        t = best.clean_text()
        if len(t) >= MIN_HTML_CONTENT_LENGTH:
            return t, "heuristic"
    return _body_paragraphs_text(root, exclude_selectors), "heuristic"


# ---------------- readability fallback (M12) ----------------

MIN_POST_EXTRACTION_WORDS = 50  # service.go:26


def readability_extract(root: Node) -> tuple[str, str]:
    """Arc90-style readability approximation (the reference links
    go-shiori/go-readability; the public scoring idea: paragraphs vote for
    their parent by text length and comma count, best parent wins).
    Returns (title, text)."""
    title_node = select_first(root, "title")
    title = title_node.clean_text() if title_node is not None else ""
    scores: dict[int, float] = {}
    parents: dict[int, Node] = {}
    for p in root.iter_nodes():
        if p.tag not in ("p", "pre", "td"):
            continue
        text = p.clean_text()
        if len(text) < 25:
            continue
        score = 1.0 + text.count(",") + min(len(text) / 100.0, 3.0)
        parent = p.parent
        if parent is None:
            continue
        scores[id(parent)] = scores.get(id(parent), 0.0) + score
        parents[id(parent)] = parent
        gp = parent.parent
        if gp is not None:
            scores[id(gp)] = scores.get(id(gp), 0.0) + score / 2.0
            parents[id(gp)] = gp
    if not scores:
        return title, ""
    best_id = max(scores, key=lambda k: scores[k])
    best = parents[best_id]
    paras = [n.clean_text() for n in best.iter_nodes() if n.tag == "p"]
    paras = [t for t in paras if t]
    return title, "\n\n".join(paras) if paras else best.clean_text()


# ---------------- metadata + JSON-LD ----------------

_JSONLD_ARTICLEISH = {"NewsArticle", "Article", "BlogPosting", "PressRelease"}
_JSONLD_NAMED = {"Event", "SpecialAnnouncement", "Report"}

_RFC3339_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:[Zz]|[+-]\d{2}:?\d{2})?$"
)


def _valid_rfc3339(s: str) -> bool:
    return bool(_RFC3339_RE.match(s.strip()))


def _get_meta(root: Node, prop: str) -> str:
    n = select_first(root, f"meta[property='{prop}']")
    if n is not None and n.attrs.get("content"):
        return n.attrs["content"]
    n = select_first(root, f"meta[name='{prop}']")
    if n is not None and n.attrs.get("content"):
        return n.attrs["content"]
    return ""


def extract_jsonld(root: Node) -> dict:
    """Typed JSON-LD dispatch (extractor_jsonld.go:63-230): supported
    @types map their fields onto jsonld_* keys; author/publisher/image
    string-vs-object variants are normalized to strings."""
    result: dict = {}
    for script in select(root, "script[type='application/ld+json']"):
        raw = script.text().strip()
        if not raw:
            continue
        try:
            data = json.loads(unescape(raw))
        except Exception:
            continue
        objs = data if isinstance(data, list) else [data]
        for obj in objs:
            if not isinstance(obj, dict):
                continue
            t = obj.get("@type")
            if not isinstance(t, str):
                continue
            if t in _JSONLD_ARTICLEISH:
                _jsonld_article_fields(obj, result)
            elif t == "Event":
                _jsonld_event_fields(obj, result)
            elif t == "SpecialAnnouncement":
                _jsonld_string_map(obj, result, {"name": "jsonld_headline",
                                                 "text": "jsonld_description"})
                if isinstance(obj.get("datePosted"), str) and obj["datePosted"]:
                    result["jsonld_date_published"] = obj["datePosted"]
                _jsonld_author(obj, result)
            elif t == "Report":
                _jsonld_string_map(obj, result, {
                    "name": "jsonld_headline", "description": "jsonld_description",
                    "url": "jsonld_url", "datePublished": "jsonld_date_published"})
                _jsonld_author(obj, result)
            else:
                continue
            result["jsonld_schema_type"] = t
            # indexed raw blob rides along, polymorphic fields flattened
            # (extractor_jsonld.go:134-135)
            result["jsonld_raw"] = normalize_jsonld_object(obj)
    return result


def _jsonld_string_map(obj: dict, result: dict, fieldmap: dict) -> None:
    for key, out in fieldmap.items():
        v = obj.get(key)
        if isinstance(v, str) and v:
            result[out] = v


def _jsonld_article_fields(obj: dict, result: dict) -> None:
    _jsonld_string_map(obj, result, {
        "headline": "jsonld_headline", "description": "jsonld_description",
        "articleSection": "jsonld_article_section", "url": "jsonld_url",
        "dateCreated": "jsonld_date_created",
        "dateModified": "jsonld_date_modified",
        "datePublished": "jsonld_date_published"})
    wc = obj.get("wordCount")
    if isinstance(wc, (int, float)) and not isinstance(wc, bool):
        result["jsonld_word_count"] = int(wc)
    kws = obj.get("keywords")
    if isinstance(kws, list):
        strs = [k for k in kws if isinstance(k, str)]
        if strs:
            result["jsonld_keywords"] = strs
    _jsonld_author(obj, result)
    pub = obj.get("publisher")
    if isinstance(pub, dict) and isinstance(pub.get("name"), str) and pub["name"]:
        result["jsonld_publisher_name"] = pub["name"]
    _jsonld_image(obj, result)


def _jsonld_event_fields(obj: dict, result: dict) -> None:
    _jsonld_string_map(obj, result, {
        "name": "jsonld_headline", "description": "jsonld_description",
        "url": "jsonld_url"})
    if isinstance(obj.get("startDate"), str) and obj["startDate"]:
        result["jsonld_date_published"] = obj["startDate"]
    loc = obj.get("location")
    if isinstance(loc, str) and loc:
        result["jsonld_location"] = loc
    elif isinstance(loc, dict) and isinstance(loc.get("name"), str) and loc["name"]:
        result["jsonld_location"] = loc["name"]
    _jsonld_author(obj, result)
    _jsonld_image(obj, result)


def _jsonld_author(obj: dict, result: dict) -> None:
    a = obj.get("author")
    if isinstance(a, str) and a:
        result["jsonld_author"] = a
    elif isinstance(a, dict) and isinstance(a.get("name"), str) and a["name"]:
        result["jsonld_author"] = a["name"]
    elif isinstance(a, list) and a:  # variant: list of authors -> first name
        first = a[0]
        if isinstance(first, str) and first:
            result["jsonld_author"] = first
        elif isinstance(first, dict) and isinstance(first.get("name"), str):
            result["jsonld_author"] = first["name"]


def normalize_image_field(img) -> str | None:
    """image as string, {"url": ...} object, or array of either — first
    usable URL (extractor_jsonld.go normalizeImageField)."""
    if isinstance(img, str):
        return img
    if isinstance(img, dict):
        u = img.get("url")
        return u if isinstance(u, str) and u else None
    if isinstance(img, list):
        for item in img:
            if isinstance(item, str):
                return item
            if isinstance(item, dict):
                u = item.get("url")
                if isinstance(u, str) and u:
                    return u
        return None
    return None


def _jsonld_image(obj: dict, result: dict) -> None:
    url = normalize_image_field(obj.get("image"))
    if url:
        result["jsonld_image_url"] = url


# ---------------- raw JSON-LD normalization for indexing ----------------
# The reference indexes the whole articleish JSON-LD object alongside the
# typed fields, normalized so polymorphic fields (@context, author, image,
# publisher, mainEntityOfPage, wordCount) never carry object/array values
# into the search index's dynamic mapping
# (extractor_jsonld.go:307-364 normalizeJSONLDObject,
# 437-492 NormalizeJSONLDRawForIndex). Ported field-for-field; vectors
# from extractor_test.go:26-470 live in tests/test_extract_html.py.

DEFAULT_SCHEMA_ORG_URL = "https://schema.org"


def normalize_context_field(ctx) -> str:
    """@context string | {"@vocab": ...} object | array -> string
    (extractor_jsonld.go:369-390)."""
    if isinstance(ctx, str):
        return ctx
    if isinstance(ctx, dict):
        v = ctx.get("@vocab")
        return v if isinstance(v, str) else DEFAULT_SCHEMA_ORG_URL
    if isinstance(ctx, list):
        for item in ctx:
            if isinstance(item, str):
                return item
        return DEFAULT_SCHEMA_ORG_URL
    return DEFAULT_SCHEMA_ORG_URL


def normalize_object_to_name(val) -> str | None:
    """string | {"name": ...} -> name string, else None (removal signal)
    (extractor_jsonld.go:421-434)."""
    if isinstance(val, str):
        return val
    if isinstance(val, dict):
        name = val.get("name")
        if isinstance(name, str) and name:
            return name
    return None


def normalize_entity_to_url(val) -> str | None:
    """mainEntityOfPage string | object with @id/url -> URL string
    (extractor_jsonld.go:503-520): @id wins over url."""
    if isinstance(val, str):
        return val
    if isinstance(val, dict):
        i = val.get("@id")
        if isinstance(i, str) and i:
            return i
        u = val.get("url")
        if isinstance(u, str) and u:
            return u
    return None


def normalize_author_field(val) -> str | None:
    """author string | object | array -> string; array entries join with
    ", " and nameless objects drop (extractor_jsonld.go:528-573)."""
    if isinstance(val, str):
        return val
    if isinstance(val, dict):
        name = val.get("name")
        return name if isinstance(name, str) and name else None
    if isinstance(val, list):
        names = []
        for item in val:
            if isinstance(item, str):
                names.append(item)
            elif isinstance(item, dict):
                name = item.get("name")
                if isinstance(name, str) and name:
                    names.append(name)
        return ", ".join(names) if names else None
    return None


def normalize_to_string(val) -> str:
    """Scalar -> string, matching Go fmt %v: bools lowercase, whole
    floats print without the trailing .0 (extractor_jsonld.go:522-525)."""
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        return _go_float_g(val)
    return str(val)


def _go_float_g(val: float) -> str:
    """strconv.FormatFloat(v, 'g', -1, 64), the formatter behind Go's
    %v: shortest round-trip digits, fixed notation while the decimal
    exponent is in [-4, 6), e-form with a two-digit exponent otherwise
    (ftoa.go: shortest 'g' uses eprec=6 — NOT encoding/json's 1e21 ES6
    cutoff). So 12345.75 -> "12345.75", 999999.0 -> "999999", but
    2000000.0 -> "2e+06" and 0.00001 -> "1e-05"."""
    import decimal
    import math

    if val != val or val in (float("inf"), float("-inf")):
        return {float("inf"): "+Inf", float("-inf"): "-Inf"}.get(val, "NaN")
    if val == 0.0:
        return "-0" if math.copysign(1.0, val) < 0 else "0"
    d = decimal.Decimal(repr(val)).normalize()
    sign, digits, dexp = d.as_tuple()
    mant = "".join(map(str, digits))
    nd = len(mant)
    exp = dexp + nd - 1  # decimal exponent of the leading digit
    if -4 <= exp < 6:
        if exp >= nd - 1:
            s = mant + "0" * (exp - nd + 1)
        elif exp >= 0:
            s = mant[: exp + 1] + "." + mant[exp + 1:]
        else:
            s = "0." + "0" * (-exp - 1) + mant
    else:
        frac = mant[1:]
        s = (mant[0] + ("." + frac if frac else "")
             + f"e{'+' if exp >= 0 else '-'}{abs(exp):02d}")
    return ("-" if sign else "") + s


def normalize_publisher_value(val) -> str | None:
    """publisher string | object | array (first element)
    (extractor_jsonld.go:487-492)."""
    if isinstance(val, list):
        return normalize_object_to_name(val[0]) if val else None
    return normalize_object_to_name(val)


def normalize_main_entity_value(val) -> str | None:
    """mainEntityOfPage with the array variant (first element)
    (extractor_jsonld.go:494-500)."""
    if isinstance(val, list):
        return normalize_entity_to_url(val[0]) if val else None
    return normalize_entity_to_url(val)


def _set_or_delete(out: dict, key: str, val) -> None:
    if val is None:
        out.pop(key, None)
    else:
        out[key] = val


def normalize_jsonld_object(obj: dict) -> dict:
    """Shallow-copied object with every polymorphic field normalized to a
    string (extractor_jsonld.go:307-364). Note mainEntityOfPage here uses
    the NON-array normalizer, mirroring the reference's asymmetry with
    NormalizeJSONLDRawForIndex."""
    out = dict(obj)
    if "@context" in out:
        out["@context"] = normalize_context_field(out["@context"])
    if "author" in out:
        _set_or_delete(out, "author", normalize_author_field(out["author"]))
    if "image" in out:
        _set_or_delete(out, "image", normalize_image_field(out["image"]))
    if "publisher" in out:
        _set_or_delete(out, "publisher",
                       normalize_object_to_name(out["publisher"]))
    if "mainEntityOfPage" in out:
        _set_or_delete(out, "mainEntityOfPage",
                       normalize_entity_to_url(out["mainEntityOfPage"]))
    if "wordCount" in out:
        out["wordCount"] = normalize_to_string(out["wordCount"])
    return out


def normalize_jsonld_raw_for_index(jsonld_data: dict | None) -> None:
    """Idempotent pre-index guard over jsonld_data["jsonld_raw"], mutating
    in place (extractor_jsonld.go:437-485): publisher/mainEntityOfPage
    accept the array variant here, author/image share the object
    normalizers."""
    if not isinstance(jsonld_data, dict):
        return
    raw = jsonld_data.get("jsonld_raw")
    if not isinstance(raw, dict):
        return
    if "publisher" in raw:
        _set_or_delete(raw, "publisher",
                       normalize_publisher_value(raw["publisher"]))
    if "author" in raw:
        _set_or_delete(raw, "author", normalize_author_field(raw["author"]))
    if "image" in raw:
        _set_or_delete(raw, "image", normalize_image_field(raw["image"]))
    if "mainEntityOfPage" in raw:
        _set_or_delete(raw, "mainEntityOfPage",
                       normalize_main_entity_value(raw["mainEntityOfPage"]))


DATE_CSS_SELECTORS = [".published-date", ".post-date", ".entry-date", ".article-date"]
BYLINE_CSS_SELECTORS = [".byline", ".author", ".post-author", ".article-author"]


def extract_metadata(root: Node) -> dict:
    """Meta/OG tags + canonical + the author/date fallback chains
    (extractor_metadata.go:59-190)."""
    out = {
        "meta_description": _get_meta(root, "description"),
        "meta_keywords": _get_meta(root, "keywords"),
        "og_type": _get_meta(root, "og:type"),
        "og_title": _get_meta(root, "og:title"),
        "og_description": _get_meta(root, "og:description"),
        "og_image": _get_meta(root, "og:image"),
        "og_url": _get_meta(root, "og:url"),
        "og_site_name": _get_meta(root, "og:site_name"),
        "author": _get_meta(root, "author"),
        "article_section": _get_meta(root, "article:section"),
        "canonical_url": "",
        "published_date": "",
    }
    link = select_first(root, "link[rel='canonical']")
    if link is not None:
        out["canonical_url"] = link.attrs.get("href") or ""

    for prop in ("article:published_time", "article:published"):
        d = _get_meta(root, prop)
        if d and _valid_rfc3339(d):
            out["published_date"] = d
            break

    jsonld = extract_jsonld(root)
    out["jsonld"] = jsonld

    # date fallbacks: JSON-LD -> <time datetime> -> date CSS selectors
    if not out["published_date"]:
        d = jsonld.get("jsonld_date_published", "")
        if isinstance(d, str) and _valid_rfc3339(d):
            out["published_date"] = d
    if not out["published_date"]:
        t = select_first(root, "time[datetime]")
        if t is not None:
            d = t.attrs.get("datetime") or ""
            if _valid_rfc3339(d):
                out["published_date"] = d
    if not out["published_date"]:
        for sel in DATE_CSS_SELECTORS:
            t = select_first(root, sel + " time")
            d = (t.attrs.get("datetime") or "") if t is not None else ""
            if not d:
                n = select_first(root, sel)
                d = n.clean_text() if n is not None else ""
            if d and _valid_rfc3339(d):
                out["published_date"] = d
                break

    # author fallbacks: JSON-LD -> rel=author -> byline selectors
    if not out["author"]:
        out["author"] = jsonld.get("jsonld_author", "") or ""
    if not out["author"]:
        a = select_first(root, "a[rel='author']")
        out["author"] = a.clean_text() if a is not None else ""
    if not out["author"]:
        for sel in BYLINE_CSS_SELECTORS:
            n = select_first(root, sel)
            if n is not None and n.clean_text():
                out["author"] = n.clean_text()
                break
    return out


# ---------------- CMS template registry (M14) ----------------

class CMSTemplate:
    def __init__(self, name, domains=(), detect=None, container="", body="",
                 title="", exclude=()):
        self.name = name
        self.domains = tuple(domains)
        self.detect = detect
        self.container = container
        self.body = body
        self.title = title
        self.exclude = tuple(exclude)


# templates.go:29-120 — the registry is public reference data; ordering
# matters (generic_og_article MUST stay after wordpress/drupal).
TEMPLATE_REGISTRY = [
    CMSTemplate(
        "postmedia",
        domains=["calgaryherald.com", "vancouversun.com", "montrealgazette.com",
                 "edmontonjournal.com", "ottawacitizen.com", "nationalpost.com",
                 "leaderpost.com", "thestarphoenix.com", "lfpress.com",
                 "windsorstar.com", "theprovince.com"],
        container="article.article-content",
        body=".article-content__content-group",
        title="h1.article-title",
    ),
    CMSTemplate("torstar", domains=["thestar.com"], container="article",
                body=".c-article-body__content, .article-body-text", title="h1"),
    CMSTemplate(
        "village_media",
        domains=["villagemedia.ca", "baytoday.ca", "sudbury.com",
                 "northernontario.ctvnews.ca"],
        container=".article-detail", body=".article-detail__body",
        title="h1.article-detail__title",
    ),
    CMSTemplate("black_press",
                domains=["blackpress.ca", "abbynews.com", "nanaimobulletin.com"],
                container="article", body=".article-body-text, .article-body",
                title="h1"),
    CMSTemplate("wordpress",
                detect=lambda h: 'name="generator" content="WordPress' in h,
                container="article", body=".entry-content",
                title="h1.entry-title"),
    CMSTemplate("drupal",
                detect=lambda h: 'name="generator" content="Drupal' in h,
                body=".field--name-body", title="h1.page-title"),
    CMSTemplate(
        "generic_og_article",
        detect=lambda h: (
            ('og:type" content="article"' in h.lower()
             or 'property="og:type" content="article"' in h.lower())
            and "<article" in h.lower()),
        container="article", body=".entry-content, [itemprop=articleBody]",
    ),
]

_DOMAIN_INDEX = {d: t for t in TEMPLATE_REGISTRY for d in t.domains}
_NAME_INDEX = {t.name: t for t in TEMPLATE_REGISTRY}
HTML_DETECT_SIZE = 4096


def resolve_template(url: str, html: str, template_hint: str = "") -> CMSTemplate | None:
    """templates.go resolve priority: hint > domain > HTML detection."""
    if template_hint and template_hint in _NAME_INDEX:
        return _NAME_INDEX[template_hint]
    host = re.sub(r"^[a-z]+://", "", url or "").split("/")[0].split(":")[0].lower()
    host = host[4:] if host.startswith("www.") else host
    if host in _DOMAIN_INDEX:
        return _DOMAIN_INDEX[host]
    snippet = (html or "")[:HTML_DETECT_SIZE]
    for t in TEMPLATE_REGISTRY:
        if t.detect is not None and t.detect(snippet):
            return t
    return None


# ---------------- page type (M15, page_type.go) ----------------

def classify_page_type(title: str, word_count: int, link_count: int,
                       og_type: str, jsonld_type: str, html: str,
                       detected_content_type: str = "") -> str:
    lower = (html or "").lower()
    article_tags = lower.count("<article")
    has_datetime = "<time datetime" in lower
    has_signin = ("sign in" in lower or "log in" in lower or "sign-in" in lower)
    if has_signin:
        return "other"
    score = 0
    if jsonld_type.lower() in ("article", "newsarticle", "blogposting", "reportage"):
        score += 5
    if og_type.lower() == "article":
        score += 3
    if detected_content_type.lower() == "article":
        score += 3
    if article_tags > 0:
        score += 2
    if has_datetime:
        score += 1
    if title and word_count >= 200:
        score += 4
    if score >= 4:
        return "article"
    if link_count >= 20 and (word_count == 0 or word_count // link_count < 10):
        return "listing"
    if title and word_count < 50:
        return "stub"
    return "other"


# ---------------- top-level page extraction ----------------

def extract_page(html: str, url: str = "", container_selector: str = "",
                 body_selector: str = "", exclude_selectors=(),
                 template_hint: str = "") -> dict:
    """One page through the full chain; returns a flat record (the
    RawContentData analog). Selector resolution priority mirrors
    service.go:450-487: explicit source selectors, else CMS template,
    else heuristics."""
    root = parse_dom(html)
    template = None
    method = "selector"
    if not container_selector and not body_selector:
        template = resolve_template(url, html, template_hint)
        if template is not None:
            container_selector = template.container
            body_selector = template.body
            exclude_selectors = tuple(exclude_selectors) + template.exclude
            method = "template"

    text, used = extract_raw_text(
        parse_dom(html),  # fresh tree: excludes mutate it
        container_selector, body_selector, exclude_selectors,
    )
    if used == "heuristic":
        method = "heuristic"

    # title: template title selector -> JSON-LD headline -> og:title ->
    # <title> -> first h1 (extractor_test.go TitleFallbackChain: JSON-LD
    # beats og:title)
    title = ""
    if template is not None and template.title:
        n = select_first(root, template.title)
        title = n.clean_text() if n is not None else ""
    meta = extract_metadata(root)
    jsonld = meta.pop("jsonld")
    if not title:
        title = jsonld.get("jsonld_headline", "") or meta["og_title"]
    if not title:
        n = select_first(root, "title")
        title = n.clean_text() if n is not None else ""
    if not title:
        n = select_first(root, "h1")
        title = n.clean_text() if n is not None else ""

    # readability fallback when the chain produced negligible content
    # (service.go:247-273: replace whenever fallback text is non-empty and
    # the current text is still under the post-extraction word gate)
    if len(text.split()) < MIN_POST_EXTRACTION_WORDS:
        r_title, r_text = readability_extract(parse_dom(html))
        if r_text:
            text = r_text
            method = "readability"
        if not title and r_title:
            title = r_title

    word_count = len(text.split())
    link_count = sum(1 for n in root.iter_nodes() if n.tag == "a")
    page_type = classify_page_type(
        title, word_count, link_count, meta["og_type"],
        str(jsonld.get("jsonld_schema_type", "")), html,
    )
    # pre-index guard (service.go:637 runs it before every index write):
    # idempotent over the already-normalized jsonld_raw, and catches any
    # raw variant a future extractor path leaves un-normalized
    normalize_jsonld_raw_for_index(jsonld)
    return {
        "url": url,
        "title": title,
        "raw_text": text,
        "word_count": word_count,
        "extraction_method": method,
        "template_name": template.name if template is not None else "",
        "page_type": page_type,
        "author": meta["author"],
        "published_date": meta["published_date"],
        "canonical_url": meta["canonical_url"],
        "meta_description": meta["meta_description"],
        "og_type": meta["og_type"],
        "og_title": meta["og_title"],
        "og_image": meta["og_image"],
        "og_site_name": meta["og_site_name"],
        "article_section": meta["article_section"]
        or str(jsonld.get("jsonld_article_section", "")),
        "jsonld_schema_type": str(jsonld.get("jsonld_schema_type", "")),
        "jsonld_headline": str(jsonld.get("jsonld_headline", "")),
        "jsonld_author": str(jsonld.get("jsonld_author", "")),
        "jsonld_publisher": str(jsonld.get("jsonld_publisher_name", "")),
        "jsonld_image_url": str(jsonld.get("jsonld_image_url", "")),
        "jsonld_date_published": str(jsonld.get("jsonld_date_published", "")),
        "jsonld_keywords": ",".join(jsonld.get("jsonld_keywords", [])),
        "jsonld_location": str(jsonld.get("jsonld_location", "")),
        # Arrow-friendly raw blob: canonical (sorted-key) JSON string of
        # the normalized articleish object (normalize_jsonld_raw_for_index
        # ran above), "" when no JSON-LD extracted
        "jsonld_raw": (
            json.dumps(jsonld["jsonld_raw"], sort_keys=True,
                       ensure_ascii=False)
            if isinstance(jsonld.get("jsonld_raw"), dict) else ""
        ),
    }


class ExtractHtmlStage:
    """map_batches stage: (url, html) batches -> extracted records. Pure
    per-row kernel — scales linearly; selectors compile per call (cheap)."""

    def __init__(self, container_selector: str = "", body_selector: str = "",
                 exclude_selectors=(), template_hint: str = ""):
        self.container = container_selector
        self.body = body_selector
        self.excludes = tuple(exclude_selectors)
        self.hint = template_hint

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = [
            extract_page(h or "", u or "", self.container, self.body,
                         self.excludes, self.hint)
            for u, h in zip(batch["url"], batch["html"])
        ]
        return pd.DataFrame(rows)
