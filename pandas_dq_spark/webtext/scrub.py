"""Regex PII/toxicity scrub — pure Catalyst ``regexp_replace`` chain
(SURVEY.md §2.8 'WT regex scrub').

Rule order is FIXED and part of the contract: email -> ssn -> phone ->
ip -> toxicity.  Each pattern is written to behave identically under
Java regex (Spark) and Python ``re`` (the reference-label generator in
tests), which is what makes byte-identical scrubbed output testable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .fixtures import TOX_WORDS

# (name, pattern, replacement) — order matters
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"\b(\+?1[-. ])?(\([0-9]{3}\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("toxicity", r"\b(" + "|".join(TOX_WORDS) + r")\b", "<TOX>"),
]


def scrub_col(c: Column) -> Column:
    """Apply the full chain as nested regexp_replace expressions —
    single projection, whole-stage codegen, no Python."""
    out = c
    for _, pat, repl in SCRUB_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_py(text: str) -> str:
    """Reference-side equivalent using Python re (for byte-identity
    golden tests)."""
    for _, pat, repl in SCRUB_RULES:
        text = re.sub(pat, repl, text)
    return text


def pii_hit_count(c: Column) -> Column:
    """How many scrub rules fired for this document (metrics sidecar)."""
    out = F.lit(0)
    for _, pat, _repl in SCRUB_RULES:
        out = out + F.when(c.rlike(pat), 1).otherwise(0)
    return out
