"""Organization-name canonicalization for signal attribution — faithful
re-expression of the reference's shared kernel
(infrastructure/signal/org_normalize.go:26-175): Normalize (lowercase,
TLD-ish suffix strip, punctuation collapse to hyphens, iterative
corporate-token strip), FromEmail / FromURL apex-domain derivation with
a compound-TLD table, and the explicit -> email -> URL Resolve chain.

Pure per-row kernels; "Acme Corporation", "Acme Corp" and
"acme-corp.com" all collapse to "acme" so cross-producer signals dedup
on one canonical string.
"""

from __future__ import annotations

import re

# trailing stems that don't add identity; "holdings"/"group" DO carry
# identity and are deliberately excluded (org_normalize.go:26-40)
CORPORATE_TOKENS = frozenset((
    "corporation", "corp", "inc", "incorporated", "llc", "ltd", "limited",
    "company", "co", "plc", "sa", "ag", "gmbh",
))

_NON_ALNUM_RUN = re.compile(r"[^a-z0-9]+")
_EMAIL_RE = re.compile(r"^[^@\s]+@([^\s@]+\.[a-zA-Z]{2,})$")


def _is_tldish(s: str) -> bool:
    return 2 <= len(s) <= 4 and all("a" <= c <= "z" for c in s)


def _strip_tld(s: str) -> str:
    i = s.rfind(".")
    if i <= 0:
        return s
    return s[:i] if _is_tldish(s[i + 1:]) else s


def _strip_corporate_tokens(s: str) -> str:
    while True:
        i = s.rfind("-")
        if i < 0 or s[i + 1:] not in CORPORATE_TOKENS:
            return s
        s = s[:i]


def normalize(name: str) -> str:
    """Canonical lowercase hyphen-separated org slug (Normalize)."""
    s = (name or "").strip().lower()
    if not s:
        return ""
    s = _strip_tld(s)
    s = _NON_ALNUM_RUN.sub("-", s).strip("-")
    return _strip_corporate_tokens(s)


def _is_compound_tld(second: str, top: str) -> bool:
    """Well-known second-level public suffixes (isCompoundTLD)."""
    if top == "uk":
        return second in ("co", "org", "gov", "ac")
    if top in ("au", "nz", "br", "mx"):
        return second in ("com", "org", "gov")
    if top == "ca":
        return second in ("gc", "on", "qc", "bc", "ab")
    if top == "jp":
        return second in ("co", "or", "go")
    return False


def _apex_label(host: str) -> str:
    host = host.rstrip(".")
    parts = host.split(".")
    if not parts or parts == [""]:
        return ""
    if len(parts) == 1:
        return normalize(parts[0])
    if len(parts) >= 3 and _is_compound_tld(parts[-2], parts[-1]):
        return normalize(parts[-3])
    return normalize(parts[-2])


def from_email(email: str) -> str:
    """Org slug from an email's apex domain (FromEmail)."""
    m = _EMAIL_RE.match((email or "").strip())
    if m is None:
        return ""
    return _apex_label(m.group(1))


def from_url(raw: str) -> str:
    """Org slug from a URL's apex domain label (FromURL)."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit((raw or "").strip())
    except ValueError:
        return ""
    host = parts.netloc
    if not host:
        return ""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    if ":" in host:
        host = host.split(":", 1)[0]
    return _apex_label(host)


def resolve(explicit: str, email: str, source_url: str) -> str:
    """Attribution fallback chain: explicit -> email -> URL (Resolve).
    Returns "" when every stage is empty (the Go ErrNoOrganization
    case) — callers surface unresolved signals rather than fail."""
    return (normalize(explicit) or from_email(email)
            or from_url(source_url) or "")
