"""PII detection and redaction — native regexp expressions only.

Corpus pipelines scrub obvious machine-matchable PII (emails, IPv4s, long
digit runs) before training. The reference handles person identifiers as
STRUCTURED columns it can drop or pseudonymize; for free text the equivalent
is in-place pattern redaction. All three patterns below are written in the
common subset of Java regex (Spark) and RE2 (DuckDB/Go) — no lookaround, no
backreferences — so the DuckDB oracle replays them bit-for-bit.

regexp_replace/regexp_count are codegen expressions: the scrub runs inside
the corpus scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: emails are redacted before digit runs so the local part of
# an address can't be half-eaten by the digit pattern.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
# 9+ consecutive digits: phone/account/SSN-ish runs; short numbers (years,
# counts, quantities) survive.
DIGITRUN_PATTERN = r"[0-9]{9,}"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_PATTERN,
    "ipv4": IPV4_PATTERN,
    "digitrun": DIGITRUN_PATTERN,
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts (pii_email, pii_ipv4, pii_digitrun) for a text
    column — one pass each, all codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return {f"pii_{kind}": F.regexp_count(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()}


def redact_expr(col: Column | str, token: str = "<PII>") -> Column:
    """Text with every PII match replaced by `token`. Email first (see
    pattern-order note above), then IPv4, then digit runs."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in (EMAIL_PATTERN, IPV4_PATTERN, DIGITRUN_PATTERN):
        c = F.regexp_replace(c, pat, token)
    return c


def redact_pii(df: DataFrame, text_col: str = "text", token: str = "<PII>") -> DataFrame:
    """Attach per-kind PII counts and a redacted copy of `text_col`.

    Counts are computed on the ORIGINAL text (auditable before/after), the
    redacted column is what a training export should write. Columns:
    pii_email, pii_ipv4, pii_digitrun, <text_col>_redacted.
    """
    out = df
    for name, expr in pii_counts(F.col(text_col)).items():
        out = out.withColumn(name, expr)
    return out.withColumn(f"{text_col}_redacted", redact_expr(F.col(text_col), token))
