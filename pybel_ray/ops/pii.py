"""PII detection and redaction over a documents table.

Standard pre-training hygiene: count and scrub e-mail addresses, phone
numbers and IPv4 addresses before text ever reaches a training mix.  Both
pyarrow and DuckDB compile regexes with RE2, so the exact patterns below
produce identical matches in the engine and in a SQL oracle
(``regexp_extract_all`` / ``regexp_replace(..., 'g')``).

Everything is one vectorized RE2 pass per pattern per batch
(``pc.count_substring_regex`` / ``pc.replace_substring_regex``) — no
Python loop over rows, no state, so the stage runs as plain Ray tasks and
streams at 100 TB.

Reference scope note: the reference engine (a BEL compiler) has no PII
surface; this exists for the training-data-pipeline family alongside
``ops/text.py`` (SURVEY.md §2 "beyond-reference" operators).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["PII_PATTERNS", "PII_PLACEHOLDERS", "add_pii_stats", "redact_pii"]

#: RE2 patterns, portable between pyarrow and DuckDB (both RE2).  Order
#: matters for redaction: e-mails first (their local part may contain
#: digits a phone pattern could chew on), then phones, then bare IPv4s.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}

PII_PLACEHOLDERS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


def add_pii_stats(ds, text_col: str = "text"):
    """Append ``n_emails`` / ``n_phones`` / ``n_ipv4`` match counts.

    Counts are non-overlapping leftmost matches — exactly
    ``len(regexp_extract_all(text, pattern))`` in DuckDB.
    """

    def _f(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        t = t.append_column(
            "n_emails",
            pc.count_substring_regex(text, PII_PATTERNS["email"]).cast(pa.int64()),
        )
        t = t.append_column(
            "n_phones",
            pc.count_substring_regex(text, PII_PATTERNS["phone"]).cast(pa.int64()),
        )
        return t.append_column(
            "n_ipv4",
            pc.count_substring_regex(text, PII_PATTERNS["ipv4"]).cast(pa.int64()),
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def redact_pii(ds, text_col: str = "text", out_col: str | None = None):
    """Replace every PII match with its placeholder token.

    Applies email → phone → ipv4 in sequence (the same order as chained
    ``regexp_replace(..., 'g')`` calls in SQL, so oracles match
    byte-for-byte).  ``out_col`` defaults to overwriting ``text_col``.
    """
    target = out_col or text_col

    def _f(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        for kind in ("email", "phone", "ipv4"):
            text = pc.replace_substring_regex(
                text, pattern=PII_PATTERNS[kind],
                replacement=PII_PLACEHOLDERS[kind],
            )
        if target in t.column_names:
            return t.set_column(t.schema.get_field_index(target), target, text)
        return t.append_column(target, text)

    return ds.map_batches(_f, batch_format="pyarrow")
