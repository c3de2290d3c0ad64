"""PII detection and redaction for training-data curation.

A fixed bank of PII regexes (email, IPv4, NANP-style phone, US SSN)
applied as JVM-side ``regexp_count`` / ``regexp_replace`` Column
expressions — map-only, whole-stage-codegen, zero shuffles; at 100 TB
this is an embarrassingly parallel scan stage.

Pattern dialect: every pattern is valid and IDENTICAL in meaning across
Java regex (Spark) and RE2 (DuckDB / the oracle): no backreferences, no
lookaround, only \\b anchors, bounded repetition, and explicit classes.
That keeps the operator oracle-checkable and also mirrors this repo's
RE2-guard discipline for matcher regexes (matchers.py validate_re2).

Detection counts each category independently on the ORIGINAL text;
redaction applies the replacements in a fixed documented order
(email, ip, phone, ssn).  The bank's patterns are mutually
non-overlapping on well-formed inputs (an SSN's 3-2-4 digit grouping
never parses as a 3-3-4 phone), so order only matters for degenerate
inputs — fixing it makes the output deterministic there too.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ordered: (name, pattern, replacement token)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
)


def pii_count(col: Column, name: str) -> Column:
    """Occurrences of one PII category in ``col``."""
    pattern = {n: p for n, p, _ in PII_PATTERNS}[name]
    return F.regexp_count(col, F.lit(pattern))


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category occurrence counts, keyed by category name."""
    return {n: F.regexp_count(col, F.lit(p)) for n, p, _ in PII_PATTERNS}


def redact_pii(col: Column) -> Column:
    """``col`` with every PII occurrence replaced by its category token,
    applied in the documented bank order."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out
