"""Aggregation toolkit — explicit two-phase (combiner) aggregation.

The reference's ~40 AWK associative arrays (SURVEY.md §2.5,
webAccessLogParser.sh:669-789) are grouped counts / sums / distincts / min-max
accumulated in one process. At 100 TB a bare ``groupby().aggregate()`` ships
every row through an all-to-all shuffle, so every helper here pre-aggregates
INSIDE ``map_batches`` first (one row per key per block) and only shuffles the
partials — the classic combiner. Skewed keys are handled by the partial step
too: a hot key contributes at most one row per block to the shuffle, which is
exactly what salting would achieve for count/sum-like aggregates.

All helpers return lazily-executing Datasets; results are small (post-agg).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _partial(keys: Sequence[str], aggs: list[tuple[str, str]]):
    """Per-batch pyarrow group_by: aggs = [(col, fn)] with fn in
    {sum,min,max,count,count_all}; emits columns named f"{col}_{fn}"."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = list(dict.fromkeys(list(keys) + [c for c, _ in aggs if c]))
        spec = [((c, f) if c else ([], "count_all")) for c, f in aggs]
        return batch.select(cols).group_by(list(keys)).aggregate(spec)

    return fn


def grouped_count(ds: "ray.data.Dataset", keys: Sequence[str], alias: str = "n"):
    """groupby(keys).count() with per-block combining (A1–A21 family)."""
    keys = list(keys)
    partial = ds.map_batches(
        _partial(keys, [("", "count_all")]), batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby(keys).aggregate(Sum("count_all", alias_name=alias))


def grouped_stats(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    col: str,
    *,
    count: str | None = "n",
    sum_: str | None = None,
    min_: str | None = None,
    max_: str | None = None,
):
    """count/sum/min/max of one column per key, combined two-phase (AG1/A13)."""
    keys = list(keys)
    aggs = [(col, "sum"), (col, "min"), (col, "max"), (col, "count")]
    partial = ds.map_batches(_partial(keys, aggs), batch_format="pyarrow", zero_copy_batch=True)
    finals = [Sum(f"{col}_count", alias_name=count or "_n")]
    if sum_:
        finals.append(Sum(f"{col}_sum", alias_name=sum_))
    if min_:
        finals.append(Min(f"{col}_min", alias_name=min_))
    if max_:
        finals.append(Max(f"{col}_max", alias_name=max_))
    out = partial.groupby(keys).aggregate(*finals)
    if not count:
        out = out.drop_columns(["_n"])
    return out


def distinct_count(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    distinct: str | Sequence[str],
    alias: str = "n_distinct",
):
    """COUNT(DISTINCT distinct) GROUP BY keys (D1–D3 family).

    Two-phase: per-block dedup of (keys ∪ distinct) cuts shuffle volume, then
    a global dedup groupby, then a small count groupby.
    """
    keys = list(keys)
    dcols = [distinct] if isinstance(distinct, str) else list(distinct)
    allk = list(dict.fromkeys(keys + dcols))

    def block_dedup(batch: pa.Table) -> pa.Table:
        return batch.select(allk).group_by(allk).aggregate([])

    deduped = ds.map_batches(block_dedup, batch_format="pyarrow", zero_copy_batch=True)
    global_dedup = deduped.groupby(allk).aggregate(Count(alias_name="_dup"))
    if not keys:
        import pandas as pd

        # (global Dataset.aggregate(Count()) returns 0 in ray 2.49 — use count())
        return pd.DataFrame({alias: [int(global_dedup.count())]})
    partial = global_dedup.map_batches(
        _partial(keys, [("", "count_all")]), batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby(keys).aggregate(Sum("count_all", alias_name=alias))


def top_k(
    ds: "ray.data.Dataset",
    by: Sequence[str],
    descending: Sequence[bool],
    k: int,
    *,
    prune_blocks: bool = True,
):
    """Global top-k by a composite ordering (§2.6 K1–K8).

    Scale path: each block is pruned to its local top-k first (sound because a
    row outside its block's top-k cannot be in the global top-k under the same
    total order), so the global sort ranges over ≤ k×num_blocks rows instead
    of the full dataset. Ties are broken by the trailing ascending key columns
    so results are deterministic under any parallelism.
    """
    by = list(by)
    descending = list(descending)

    if prune_blocks:
        order = [(c, "descending" if d else "ascending") for c, d in zip(by, descending)]

        def local_topk(batch: pa.Table) -> pa.Table:
            if batch.num_rows <= k:
                return batch
            ix = pc.sort_indices(batch, sort_keys=order)[:k]
            return batch.take(ix)

        ds = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return ds.sort(by, descending=descending).limit(k)


def pivot_counts(
    counts: "ray.data.Dataset",
    row_key: str,
    col_key: str,
    value: str,
    columns: Sequence[str],
):
    """Pivot a (row_key, col_key, value) count table wide with zero-fill
    (AG6 — fixed column dictionary like webAccessLogParser.sh:796,799).
    Runs as map_groups over the already-small aggregate table."""
    import pandas as pd

    columns = list(columns)

    def pivot_group(g: pd.DataFrame) -> pd.DataFrame:
        m = dict(zip(g[col_key], g[value]))
        row = {row_key: g[row_key].iloc[0]}
        for c in columns:
            row[c] = int(m.get(c, 0))
        return pd.DataFrame([row])

    return counts.groupby(row_key).map_groups(pivot_group, batch_format="pandas")


def threshold_alerts(
    agg_df,
    *,
    rule: str,
    key_col: str,
    value_col: str,
    threshold: float,
):
    """Threshold broadcast-join → alerts rows (J5; websphereLogParser.sh:345-379).

    Takes the (small) aggregate table as pandas, returns alert rows
    (rule, key, value, threshold) where value > threshold."""
    import pandas as pd

    hits = agg_df[agg_df[value_col] > threshold]
    return pd.DataFrame(
        {
            "rule": rule,
            "key": hits[key_col].astype(str),
            "value": hits[value_col].astype(float),
            "threshold": float(threshold),
        }
    )
