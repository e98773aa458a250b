"""PII detection + redaction for training-data curation, as pure JVM
column expressions (regexp_count / regexp_replace — whole-stage
codegen, no Python in the hot path).

Patterns are deliberately ASCII-conservative so Spark's Java regex and
DuckDB's RE2 agree byte-for-byte (no \\b word boundaries, no lookarounds,
no unicode classes): email, dashed US phone, IPv4, SSN-shaped ids.
Pattern shapes kept mutually non-overlapping (phones use dashes only,
IPv4 uses dots only) so count columns are engine-order independent;
the one structural overlap — an ipv4-shaped quad inside an email host
— is resolved by counting ipv4 on the email-stripped text, matching
the redaction order.

At 100 TB this is a map-only stage: no shuffle, the scan's ReadSchema
carries only the text column, and the redaction output streams straight
to the sink. A production deployment swaps the pattern table for its
legal team's; the Spark plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered dict of pattern name -> (regex, replacement token)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    "phone": (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
}

# match order matters for redaction: phone (3-3-4) before ssn (3-2-4)
# never overlaps; email before ipv4 so host-part dots aren't re-scanned
_REDACT_ORDER = ("email", "phone", "ssn", "ipv4")


def pii_columns(text: Column) -> dict[str, Column]:
    """Per-document PII hit counts (bigint) plus a total. Counts agree
    with redact_pii's replacement count: ipv4 is counted on the
    email-stripped text, since an ipv4-shaped quad inside an email
    host (b@host1.2.3.4.example.com) is redacted once as the email,
    not twice."""
    email_pat, email_repl = PII_PATTERNS["email"]
    out: dict[str, Column] = {}
    total = F.lit(0).cast("bigint")
    for name, (pat, _) in PII_PATTERNS.items():
        src = (
            F.regexp_replace(text, email_pat, email_repl)
            if name == "ipv4" else text
        )
        c = F.regexp_count(src, F.lit(pat)).cast("bigint")
        # a dashed phone also matches nothing else; ssn (3-2-4) is
        # disjoint from phone (3-3-4) by the middle-group width
        out[f"n_{name}"] = c
        total = total + c
    out["n_pii"] = total
    return out


def redact_pii(text: Column) -> Column:
    """Replace every PII hit with its typed placeholder token."""
    for name in _REDACT_ORDER:
        pat, repl = PII_PATTERNS[name]
        text = F.regexp_replace(text, pat, repl)
    return text
