"""Stateful enrich stage — broadcast-lookup actor pool.

The analogue of the reference's BEGIN-block lookup loads (SURVEY.md §2.3
ST1–ST4, §2.4 J1): cloneID→WAS (webAccessLogParser.sh:196-201, used at :440),
threshold table (websphereLogParser.sh:150-161), per-URI baseline
(webAccessLogParser.sh:216-223).

Ray-native shape: the driver ``ray.put``s each small lookup table ONCE; the
actor pool resolves the refs in ``__init__`` (once per worker process, never
per batch) and every ``__call__`` does a vectorized dictionary-encode + take —
a broadcast hash join with no shuffle. At 100 TB the lookups still ship once
per node via the object store, not once per task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from log_parser_ray.schema import (
    CATEGORY_NONE,
    CATEGORY_UNMATCHED,
    ROLE_SEVERITIES,
    ROLE_SEVERITY_DEFAULT,
    TOOL_CATEGORIES,
)


def _lookup(values: pa.ChunkedArray, mapping: dict, default: str, none_value: str | None):
    """Vectorized dict lookup on a string column.

    default: value for keys present but not in the mapping.
    none_value: value for null keys (None → keep null).
    """
    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    np_vals = arr.to_numpy(zero_copy_only=False)
    keys = list(mapping.keys())
    key_to_ix = {k: i for i, k in enumerate(keys)}
    mapped = np.array([mapping[k] for k in keys] + [default], dtype=object)
    ix = np.fromiter(
        (key_to_ix.get(v, len(keys)) for v in np_vals), dtype=np.int64, count=len(np_vals)
    )
    out = mapped[ix]
    if none_value is not None:
        isnull = np.array([v is None for v in np_vals])
        out[isnull] = none_value
    return pa.array(out, type=pa.string())


class Enricher:
    """Actor-pool callable: tool→category, role→severity lookups.

    Construct-once state (ST1/ST2): object-store refs are fetched here, in
    ``__init__`` — NOT per batch. Used via
    ``ds.map_batches(Enricher, fn_constructor_kwargs=..., concurrency=N)``.
    """

    def __init__(self, tool_categories_ref=None, role_severities_ref=None):
        self.tool_categories = (
            ray.get(tool_categories_ref) if tool_categories_ref is not None else dict(TOOL_CATEGORIES)
        )
        self.role_severities = (
            ray.get(role_severities_ref) if role_severities_ref is not None else dict(ROLE_SEVERITIES)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        category = _lookup(
            batch["tool"], self.tool_categories, CATEGORY_UNMATCHED, CATEGORY_NONE
        )
        role_severity = _lookup(
            batch["role"], self.role_severities, ROLE_SEVERITY_DEFAULT, ROLE_SEVERITY_DEFAULT
        )
        return batch.append_column("category", category).append_column(
            "role_severity", role_severity
        )


def enrich_dataset(
    ds,
    tool_categories: dict[str, str] | None = None,
    role_severities: dict[str, str] | None = None,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 32768,
):
    """Attach category/role_severity via a broadcast-lookup actor pool."""
    kwargs = {}
    if tool_categories is not None:
        kwargs["tool_categories_ref"] = ray.put(dict(tool_categories))
    if role_severities is not None:
        kwargs["role_severities_ref"] = ray.put(dict(role_severities))
    return ds.map_batches(
        Enricher,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def enrich_sql_cte(
    tool_categories: dict[str, str] | None = None,
    role_severities: dict[str, str] | None = None,
) -> str:
    """Identical lookup semantics as SQL CASE expressions over `parsed`."""
    tc = tool_categories or TOOL_CATEGORIES
    rs = role_severities or ROLE_SEVERITIES
    tc_cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in tc.items())
    rs_cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in rs.items())
    return f"""
enriched AS (
  SELECT *,
    CASE WHEN tool IS NULL THEN '{CATEGORY_NONE}'
         ELSE (CASE tool {tc_cases} ELSE '{CATEGORY_UNMATCHED}' END) END AS category,
    CASE role {rs_cases} ELSE '{ROLE_SEVERITY_DEFAULT}' END AS role_severity
  FROM parsed
)
""".strip()
