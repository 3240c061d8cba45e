"""PII detection and redaction over text columns.

A training-data pipeline scrubs personal identifiers before a corpus ships:
emails, phone numbers, IP addresses, and — the log-specific case — user ids
embedded in request/auth lines. The reference works the same surface when it
decomposes JSESSIONID / uid cookies into per-user keys and then reports only
aggregates (webAccessLogParser.sh:380-414, 416-440); this module is the
redaction counterpart: find the identifiers, count them, and rewrite the
text with typed placeholders.

Scale shape: both ops are stateless single-pass ``map_batches`` over
zero-copy Arrow — no shuffle, no driver traffic beyond the tiny stats
table. Every rule is one RE2 kernel (`count_substring_regex` /
`replace_substring_regex`) over the whole column; redaction rewrites the
string column once per rule. DuckDB's regexp functions are also RE2, so the
oracle SQL (`pii_sql_exprs`) applies the SAME patterns in the SAME order
and the outputs hash-compare exactly.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# (rule name, RE2 pattern, replacement) — applied IN ORDER, both engines.
# Order matters where matches could overlap: ipv4 before phone so a dotted
# quad is never half-eaten by the phone rule.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("uid", r"\buid=[A-Za-z0-9]+", "uid=<UID>"),
]


def pii_stats(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Corpus totals per rule: (rule, n_matches, n_rows) — n_rows counts rows
    containing at least one match. Partial one-row-per-rule sums inside each
    task, then a tiny grouped combine (the shuffle moves ≤ len(PII_RULES)
    rows per block)."""
    from log_parser_ray.stages.aggregate import sorted_combine

    def partial(t: pa.Table) -> pa.Table:
        # Progressive chain — count rule i over text already redacted by
        # rules 0..i-1, mirroring pii_redact (and the oracle's nested
        # regexp_replace), so matches-inside-matches are counted once.
        col = t[text_col]
        names, matches, rows = [], [], []
        for name, pattern, repl in PII_RULES:
            c = pc.count_substring_regex(col, pattern)
            names.append(name)
            matches.append(pc.sum(c).as_py() or 0)
            rows.append(pc.sum(pc.greater(c, 0)).as_py() or 0)
            col = pc.replace_substring_regex(col, pattern, repl)
        return pa.table(
            {
                "rule": pa.array(names),
                "n_matches": pa.array(matches, type=pa.int64()),
                "n_rows": pa.array(rows, type=pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_combine(
        partials,
        ["rule"],
        [("n_matches", "sum"), ("n_rows", "sum")],
        renames={"n_matches_sum": "n_matches", "n_rows_sum": "n_rows"},
        keep=["rule", "n_matches", "n_rows"],
    )


def pii_redact(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    keep_cols: Sequence[str] | None = None,
) -> "ray.data.Dataset":
    """Rewrite ``text_col`` with typed placeholders; adds ``n_redactions``
    (total replacements across all rules for that row)."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        total = None
        for _, pattern, repl in PII_RULES:
            c = pc.count_substring_regex(col, pattern)
            total = c if total is None else pc.add(total, c)
            col = pc.replace_substring_regex(col, pattern, repl)
        out = t.set_column(t.schema.get_field_index(text_col), text_col, col)
        out = out.append_column("n_redactions", pc.cast(total, pa.int64()))
        if keep_cols is not None:
            out = out.select(list(keep_cols) + [text_col, "n_redactions"])
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pii_sql_exprs(text_col: str = "text") -> tuple[str, str]:
    """(redacted-text SQL expression, total-match-count SQL expression) that
    apply PII_RULES identically in DuckDB — the oracle side of both ops."""
    red = text_col
    counts = []
    # DuckDB single-quoted literals keep backslashes verbatim (no escape
    # processing), so the RE2 pattern embeds as-is; only quotes need doubling.
    for _, pattern, repl in PII_RULES:
        pat = pattern.replace("'", "''")
        rep = repl.replace("'", "''")
        counts.append(f"len(regexp_extract_all({red}, '{pat}'))")
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return red, " + ".join(counts)
