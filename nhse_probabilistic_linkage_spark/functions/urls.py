"""URL canonicalization — the web-corpus analog of the reference's field
cleaning.

The reference normalizes person fields before blocking (case folding,
whitespace/special-char stripping, 0→O substitution — scalar Python UDFs at
/root/reference/utils/preprocessing_utils.py:17-67,84-125). For web pages
the same role is played by URL canonicalization: two crawls of one page
routinely differ only in scheme, www, tracking parameters, fragments, or a
trailing slash, and every one of those spurious variants becomes a separate
doc_id unless the key is canonicalized first.

All pure Catalyst expressions (lower/regexp_replace/regexp_extract) — no
Python, fully pushdown-friendly, safe to run in the scan stage of a
10^12-row ingest. Deterministic and versioned like normalize_text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_NORMALIZE_VERSION = 1

# Tracking parameters stripped during canonicalization: the industry-common
# click/campaign identifiers (any utm_*, plus the big ad-click ids).
_TRACKING = r"(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|referrer)"


def normalize_url(col: Column | str) -> Column:
    """Canonical form of a URL, built as a chain of native regexp rewrites:

      1. lowercase scheme+host (path/query case is preserved — it is
         significant on most servers);
      2. default scheme http:// when missing; https -> http (scheme is not
         identity);
      3. strip a leading www.;
      4. drop the #fragment;
      5. drop tracking query parameters (utm_*, gclid, ...), then a dangling
         '?' or '&';
      6. strip one trailing slash from a non-root path.
    """
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host prefix only
    lowered = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    # no scheme at all -> treat as http://
    with_scheme = F.when(lowered.rlike(r"^[a-z][a-z0-9+.-]*://"), lowered).otherwise(
        F.concat(F.lit("http://"), F.lower(F.regexp_extract(c, r"^([^/?#]*)", 1)),
                 F.regexp_replace(c, r"^[^/?#]*", ""))
    )
    u = F.regexp_replace(with_scheme, r"^https://", "http://")
    u = F.regexp_replace(u, r"^http://www\.", "http://")
    u = F.regexp_replace(u, r"#.*$", "")
    # tracking params: three positional rules so separators stay coherent —
    # '&utm=x' mid/tail drops with its '&'; a leading '?utm=x&' hands the '?'
    # to the next param; a lone '?utm=x' disappears with its '?'
    u = F.regexp_replace(u, r"&" + _TRACKING + r"=[^&#]*", "")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"=[^&#]*$", "")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"(.)/$", "$1")
    return u


def url_host(col: Column | str) -> Column:
    """Registered host of a URL (lowercased, www-stripped) — the standard
    partitioning/grouping key for per-site statistics and politeness."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.regexp_extract(c, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:www\.)?([^/?#:]+)", 1))
    return host


def url_key(col: Column | str) -> Column:
    """Stable 64-bit dedup key of the canonical URL (xxhash64) — what doc_id
    should be derived from so trivially-variant crawls of one page collapse
    BEFORE any content hashing happens."""
    return F.xxhash64(normalize_url(col))
