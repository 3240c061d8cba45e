"""URL canonicalization and URL-level exact dedup.

The reference's URL handling is the access parser's decompose (M7:
webAccessLogParser.sh:497-520 splits the request URI into base / extension /
domain tokens before rollups). At web-crawl scale the same decompose feeds
the FIRST dedup pass of a training-data pipeline: CCNet (arXiv:1911.00359)
and RefinedWeb (arXiv:2306.01116 §3.2) both dedup by normalized URL before
any content-based pass, because it removes the bulk of recrawl duplicates
for the cost of a string kernel plus one narrow shuffle.

Canonicalization rules (each a documented fold; all RE2, identical
semantics to the DuckDB twin in `__ray_entry__._url_canonical_sql`):
  1. scheme and host lowercased (path/query stay case-sensitive per RFC 3986
     §6.2.2.1 — only the scheme and authority are case-insensitive),
  2. default ports ``:80`` / ``:443`` stripped from the authority,
  3. a leading ``www.`` stripped from the host,
  4. the fragment dropped,
  5. tracking query params removed (``utm_*``, ``gclid``, ``fbclid``),
     with ``&`` separators repaired,
  6. trailing slashes stripped from the path (root ``/`` folds to empty).
Query-param REORDERING is deliberately out of scope (sorting params can
merge semantically distinct URLs; CCNet leaves order alone too).

Inputs that do not look like ``scheme://authority...`` canonicalize to
NULL — callers decide whether NULL means "keep as unique" (filter before
the groupby) or "quarantine".

100-TB shape: the kernel is a stateless per-batch chain of Arrow RE2 /
case kernels (zero-copy in, one new string column out); `url_dedup`
shuffles ONLY (canonical_url, id) — never the text/body columns — through
the two-phase grouped count, so the exchange carries a few dozen bytes per
row regardless of document size.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# scheme://host[/path][?query][#frag] — groups ordered to match the SQL
# twin's regexp_extract(…, idx) indexes 1..5
URL_PARTS_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?P<query>\?[^#]*)?(?P<frag>#.*)?$"
)
TRACKING_PARAM_RE = r"(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*&?"


def canonical_url_array(u: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a URL string column (rules above).
    Non-matching / NULL inputs yield NULL."""
    ext = pc.extract_regex(u, URL_PARTS_RE)

    def f(name: str):
        return pc.struct_field(ext, name)

    scheme = pc.utf8_lower(f("scheme"))
    host = pc.utf8_lower(f("host"))
    host = pc.replace_substring_regex(host, r":(80|443)$", "")
    host = pc.replace_substring_regex(host, r"^www\.", "")
    path = pc.replace_substring_regex(f("path"), r"/+$", "")
    q = pc.replace_substring_regex(f("query"), r"^\?", "")
    q = pc.replace_substring_regex(q, TRACKING_PARAM_RE, "")
    q = pc.replace_substring_regex(q, r"^&+|&+$", "")
    q = pc.if_else(
        pc.equal(q, ""), q, pc.binary_join_element_wise("?", q, "")
    )
    return pc.binary_join_element_wise(scheme, "://", host, path, q, "")


def canonicalize_urls(
    ds: "ray.data.Dataset", column: str = "url", out: str = "canonical_url"
) -> "ray.data.Dataset":
    """Append a canonical-URL column (stateless task map, one RE2 chain
    per batch)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out, canonical_url_array(t[column]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def url_dedup(
    ds: "ray.data.Dataset", url_col: str = "url", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """URL-level exact dedup: one row per canonical URL with the group
    size and the min-id survivor (the same min-survivor convention as
    dedup.exact_dedup). Only (canonical_url, id) enters the shuffle."""
    from log_parser_ray.stages.aggregate import grouped_stats

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonical_url_array(t[url_col]),
                id_col: t[id_col],
            }
        )

    narrow = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_stats(
        narrow, ["canonical_url"], id_col,
        count="n_dups", min_="survivor", max_="last_id",
    )
