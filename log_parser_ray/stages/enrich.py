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

import pyarrow as pa
import pyarrow.compute as pc

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

    dictionary_encode collapses the column to its (few) unique values; the
    Python dict is consulted once per UNIQUE value, then a C-speed take maps
    every row — a true broadcast hash join with no per-row Python.

    default: value for keys present but not in the mapping.
    none_value: value for null keys (None → keep null).
    """
    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    mapped_uniq = pa.array(
        [mapping.get(u, default) for u in uniq], type=pa.string()
    )
    out = mapped_uniq.take(enc.indices)  # null indices stay null
    if none_value is not None:
        out = pc.fill_null(out, none_value)
    return out


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


def default_pool_size() -> int:
    """Actor-pool size for the fused per-row stage: proportional to the
    cluster until the per-node object-store writer cap. Beyond ~12 concurrent
    block writers a node's object store saturates and extra actors only
    contend (measured on 32 CPUs: pool 24 → 475k rows/s, pool 12 → 576k,
    pool 8 → 585k); a multi-node cluster gets 12 writers per node."""
    total = int(ray.cluster_resources().get("CPU", 4))
    n_nodes = max(1, len([n for n in ray.nodes() if n.get("Alive", True)]))
    return max(1, min((total * 3) // 4, 12 * n_nodes))


_DEFAULT_ENRICHER: "Enricher | None" = None


def _enrich_default(batch: pa.Table) -> pa.Table:
    """Stateless task path for the STATIC default tables: the lookup dicts
    are module constants, constructed once per worker process (cached), so
    there is no broadcast state to pin an actor pool for."""
    global _DEFAULT_ENRICHER
    if _DEFAULT_ENRICHER is None:
        _DEFAULT_ENRICHER = Enricher()
    return _DEFAULT_ENRICHER(batch)


def enrich_dataset(
    ds,
    tool_categories: dict[str, str] | None = None,
    role_severities: dict[str, str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32768,
):
    """Attach category/role_severity via broadcast lookups.

    With CUSTOM tables the stage is a broadcast-lookup actor pool: the
    driver ray.puts each table once, actors resolve the refs in __init__.
    With the static DEFAULT tables there is no broadcast state to hold, so
    the stage runs as a plain task map that FUSES with the upstream
    compose → parse chain — an actor pool would only add ~0.3 s/actor
    process-spawn latency per fresh pipeline (measured: 4-actor pool cost
    ~1.4 s of a 1.7 s default-enrich query at sf0.1); `concurrency` is
    ignored on this path.

    concurrency=None sizes the custom-table pool to the cluster: a FIXED
    pool of min(3/4 × total_cpus, 12 × n_nodes) actors (min 1) —
    proportional until the per-node object-store writer cap. Ray FUSES the
    upstream stateless map chain into the actor-pool operator, so the pool
    carries the pipeline's entire per-row compute — sizing it to a small
    fraction of the cluster throttles the whole job to that fraction
    (measured: pool=total/4 capped a 16-CPU flagship at ~4 cores). Spare
    CPUs are left free so reader/writer tasks are never starved by the
    actors' standing reservations; a fixed size avoids autoscaling churn
    (each scale-up pays process spawn + import while the queue stalls)."""
    if tool_categories is None and role_severities is None:
        return ds.map_batches(
            _enrich_default,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    if concurrency is None:
        concurrency = default_pool_size()
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
