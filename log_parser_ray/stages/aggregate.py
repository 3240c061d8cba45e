"""Aggregation toolkit — explicit two-phase (combiner) aggregation.

The reference's ~40 AWK associative arrays (SURVEY.md §2.5,
webAccessLogParser.sh:669-789) are grouped counts / sums / distincts / min-max
accumulated in one process. At 100 TB a bare ``groupby().aggregate()`` ships
every row through an all-to-all shuffle, so every helper here pre-aggregates
INSIDE ``map_batches`` first (whole-block batches — one combine per block,
one row per key per block into the shuffle). Skewed keys are handled by the
partial step too: a hot key contributes at most one row per block to the
shuffle, which is exactly what salting would achieve for count/sum-like
aggregates.

The shuffle itself is ``sort(keys)`` + a per-block pyarrow ``group_by``
combine — NOT ``Dataset.groupby().aggregate()``, whose per-group Python
combine is ~35× slower at high group cardinality (measured: 1.5 M partial
rows / 250 k groups: 34.6 s vs 1.0 s on 8 CPUs). Correctness rests on Ray's
range partitioner assigning ALL rows with equal key values to one partition
(boundaries compare by value, ties resolve to one side); the per-block
combine is therefore exact — pinned by tests/test_aggregate.py with
adversarially skewed keys. Output stays distributed (one block per key
range), so group cardinality can exceed single-node memory.

All helpers return lazily-executing Datasets; results are small (post-agg).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _partial(keys: Sequence[str], aggs: list[tuple[str, str]]):
    """Per-batch pyarrow group_by: aggs = [(col, fn)] with fn in
    {sum,min,max,count,count_all}; emits columns named f"{col}_{fn}"."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = list(dict.fromkeys(list(keys) + [c for c, _ in aggs if c]))
        spec = [((c, f) if c else ([], "count_all")) for c, f in aggs]
        return batch.select(cols).group_by(list(keys)).aggregate(spec)

    return fn


# Partial-combine batch size: coalesces small input blocks so the shuffle
# sees few, well-combined partials (70 tiny blocks → 70 near-useless partials
# otherwise), while bounding per-task memory to ~1M rows at scale.
COMBINE_ROWS = 1 << 20

# group_safe_map pre-sort coalesce target (see its docstring): blocks below
# this size are merged before the range sort so the sort's task fan-out
# tracks DATA size, not reader parallelism.
_SORT_TARGET_BLOCK_BYTES = 8 << 20


def _mb(ds, fn, batch_size=None):
    """batch_size=None → whole-block batches (required wherever the fn relies
    on the range-sort invariant: a block is never split, so equal keys stay
    in one batch). Pass COMBINE_ROWS for pre-shuffle partial stages."""
    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def _eq_scalar(col: pa.ChunkedArray, scalar) -> pa.ChunkedArray:
    """Null-safe col == scalar (null matches null)."""
    if not scalar.is_valid:
        return pc.is_null(col)
    return pc.fill_null(pc.equal(col, scalar), False)


def _boundary_mask(b: pa.Table, keys: Sequence[str]):
    """True for rows whose key equals the block's FIRST or LAST key — the only
    keys that can continue in an adjacent block of a sorted dataset."""
    n = b.num_rows
    eq_first = eq_last = None
    for k in keys:
        col = b[k]
        f = _eq_scalar(col, col[0])
        l = _eq_scalar(col, col[n - 1])
        eq_first = f if eq_first is None else pc.and_(eq_first, f)
        eq_last = l if eq_last is None else pc.and_(eq_last, l)
    return pc.or_(eq_first, eq_last)


def group_safe_map(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    fn,
    *,
    batch_format: str = "pyarrow",
):
    """Range-sort on ``keys`` and apply ``fn`` to whole-block batches with the
    GUARANTEE that all rows of any equal-key group land in exactly one batch.

    A bare ``sort(keys)`` + ``map_batches(batch_size=None)`` almost gives
    this (the range partitioner assigns equal keys to one partition), but
    Ray's dynamic block splitting may split an oversized sort output into
    several blocks, cutting a key group in two. Exact fix, fully
    distributed: a split key is necessarily the LAST key of one block and
    the FIRST of the next, so keys strictly interior to a block are provably
    complete there and are processed per block; every block's first-key and
    last-key rows — at most two groups per block — are coalesced into ONE
    block (``repartition(1)``) and processed together. ``fn`` must therefore
    be order-insensitive within a batch (every consumer here sorts or
    group_bys internally). Ceiling: the boundary set (≤ 2 key groups per
    block) must fit one task's memory — the same bound as any per-group
    operator has for a single hot group.

    Pinned by tests/test_aggregate.py::test_group_safe_under_block_splits
    with target_max_block_size forced tiny.

    Pre-sort coalesce: Ray's range sort costs O(num_input_blocks) sample +
    shuffle TASKS, so a tiny table fragmented into reader-parallelism blocks
    (a 600 KB parquet arrives as ~64 × 9 KB blocks) pays ~130 task
    latencies per sort — measured 2.8 s for a 6 745-row sort, and the
    dedup/curate family chains 5-6 such sorts. The input is materialized
    (the all-to-all boundary holds its input blocks in the object store
    anyway) and coalesced toward ~8 MB blocks when fragmentation is
    pathological; large inputs keep their layout, so at 100 TB this is a
    no-op and the sort keeps full fan-out."""
    keys = list(keys)

    m = ds.materialize()
    nb = m.num_blocks()
    size = m.size_bytes() or 0
    target = max(1, min(nb, size // _SORT_TARGET_BLOCK_BYTES + 1))
    if nb > 4 * target:
        m = m.repartition(target)

    def apply(d):
        # Generator wrapper: EMPTY batches produce NO output block at all.
        # Ray's sort materializes empty ranges as column-less blocks; letting
        # them reach fn (or a downstream Acero join) breaks on the missing
        # columns, and normalizing them would need fn's output schema — so
        # drop them instead.
        def gen(b):
            if len(b) == 0:
                return
            yield fn(b)

        return d.map_batches(gen, batch_format=batch_format, batch_size=None,
                             **({"zero_copy_batch": True} if batch_format == "pyarrow" else {}))

    s = m.sort(keys).materialize()
    if s.num_blocks() <= 1:
        return apply(s)

    def interior(b: pa.Table):
        if b.num_rows == 0:
            return
        yield b.filter(pc.invert(_boundary_mask(b, keys)))

    def boundary(b: pa.Table):
        if b.num_rows == 0:
            return
        yield b.filter(_boundary_mask(b, keys))

    inner = apply(_mb(s, interior))
    edge = apply(_mb(s, boundary).repartition(1))
    return inner.union(edge)


def conform_schema(ds: "ray.data.Dataset", schema: pa.Schema) -> "ray.data.Dataset":
    """Drop column-less EMPTY blocks so the dataset is safe as a JOIN input.

    Ray manufactures schema-less empty blocks for map tasks that emit no
    rows and for empty sort ranges; they poison the dataset-level schema and
    Acero hash joins abort on them ("no match for key field"). They cannot
    be fixed with map_batches — Ray never calls the fn on an empty batch —
    so this materializes the (small, post-aggregate) dataset and rebuilds it
    zero-copy from the non-empty block refs; a fully empty dataset becomes
    one empty block carrying ``schema``."""
    m = ds.materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def merge_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str | Sequence[str],
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Distributed SORT-MERGE join on plain tasks — no shuffle-actor spawn.

    Ray's hash ``Dataset.join`` spawns a fresh HashShuffleAggregator actor
    pool per call — measured ~3.5 s of data-independent fixed cost per join
    on this box (BASELINE.md dedup profile), which stacked up to the whole
    runtime of the dedup/curation family at test scale. This helper produces
    the same rows with the repo's sort machinery instead: tag each side,
    union, range-sort on the key (a task-based shuffle), and run ONE
    vectorized pandas merge per block — ``group_safe_map`` guarantees all
    rows of an equal key land in one batch, so the per-block merge is exact.
    Sort-merge is the classic distributed join (Spark's default for large
    sides); at cluster scale the sort is the same all-to-all a hash shuffle
    performs, minus the per-call actor-pool spin-up.

    ``how`` ∈ {inner, left_outer, left_semi, left_anti}. Caveats: join keys
    must be non-null (SQL would never match nulls; pandas would match
    NaN == NaN), and the two sides' non-key column names must be disjoint.
    Schemas are explicit because both inputs are lazy."""
    import numpy as np

    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    lvals = [f.name for f in left_schema if f.name not in keys]
    rvals = [f.name for f in right_schema if f.name not in rkeys]
    overlap = set(lvals) & set(rvals)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    key_clash = (set(lvals) | set(rvals)) & set(keys)
    if key_clash:
        raise ValueError(
            f"non-key columns named like join keys: {sorted(key_clash)}"
        )
    if "__side" in set(lvals) | set(rvals) | set(keys):
        raise ValueError("'__side' is reserved by merge_join")
    out_fields = [(k, left_schema.field(k).type) for k in keys]
    out_fields += [(c, left_schema.field(c).type) for c in lvals]
    if how in ("inner", "left_outer"):
        out_fields += [(c, right_schema.field(c).type) for c in rvals]
    elif how not in ("left_semi", "left_anti"):
        raise ValueError(f"unsupported how={how!r}")
    out_schema = pa.schema(out_fields)
    rtypes = {c: right_schema.field(c).type for c in rvals}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        for c in lvals:
            cols[c] = t[c]
        for c in rvals:
            cols[c] = pa.nulls(t.num_rows, rtypes[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {k: t[rk] for k, rk in zip(keys, rkeys)}
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        for c in lvals:
            cols[c] = pa.nulls(t.num_rows, left_schema.field(c).type)
        for c in rvals:
            cols[c] = t[c]
        return pa.table(cols)

    uni = _mb(left, tag_left).union(_mb(right, tag_right))

    arrow_how = {
        "inner": "inner",
        "left_outer": "left outer",
        "left_semi": "left semi",
        "left_anti": "left anti",
    }[how]

    lt_schema = pa.schema(
        [(k, left_schema.field(k).type) for k in keys]
        + [(c, left_schema.field(c).type) for c in lvals]
    )
    rt_schema = pa.schema(
        [(k, left_schema.field(k).type) for k in keys]
        + [(c, rtypes[c]) for c in rvals]
    )

    def emit(b: pa.Table) -> pa.Table:
        # in-process Acero hash join per co-located block — vectorized and
        # zero-copy for binary payloads (a pandas merge here would copy every
        # blob into Python objects). The casts pin declared types: an
        # all-empty upstream can surface null-typed columns, which Acero
        # rejects as join payloads.
        side = b["__side"]
        lt = b.filter(pc.equal(side, 0)).select(keys + lvals).cast(lt_schema)
        rt = b.filter(pc.equal(side, 1)).select(keys + rvals).cast(rt_schema)
        out = lt.join(rt, keys=keys, join_type=arrow_how)
        return out.select(out_schema.names).cast(out_schema)

    return group_safe_map(uni, keys, emit)


def with_group_size(
    ds: "ray.data.Dataset", keys: Sequence[str], alias: str = "n"
) -> "ray.data.Dataset":
    """Append each row's GROUP SIZE over ``keys`` — a window count(*) —
    in one range-sort pass (replaces grouped_count + a hash join back)."""
    keys = list(keys)

    def fn(b: pa.Table) -> pa.Table:
        counts = b.group_by(keys).aggregate([([], "count_all")])
        counts = counts.rename_columns(  # by NAME: group_by column order
            [alias if c == "count_all" else c for c in counts.column_names]
        )
        return b.join(counts, keys=keys, join_type="inner")

    return group_safe_map(ds, keys, fn)


def ordered_prefix_sum(
    ds: "ray.data.Dataset",
    order_keys: Sequence[str],
    value_col: str,
    alias: str = "cum",
) -> "ray.data.Dataset":
    """Global RUNNING TOTAL of ``value_col`` in ``order_keys`` order — the
    SQL ``SUM(v) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)``.

    Distributed scan shape (classic two-phase prefix sum): range-sort on the
    order keys, one tiny task per block computes its block total, the driver
    takes the EXCLUSIVE prefix over the per-block totals (one number per
    block — never rows), and one task per block adds its offset to the
    in-block cumulative sum. This is one of the few operators the Dataset
    API can't express (a global ordered scan), so the per-block passes run
    as raw Ray tasks over the sorted dataset's block refs; output block
    order and content stay deterministic.

    ``order_keys`` must be a TOTAL order (unique rows per key) — with ties
    the running total at tied rows would depend on their arbitrary relative
    order. ``value_col`` must be integral; nulls count as 0 (pc.sum
    semantics), and a float column raises (a safe cast — never silent
    truncation)."""
    import numpy as np
    import ray

    keys = list(order_keys)
    # same pre-sort fragmentation coalesce as group_safe_map: the sort's
    # task fan-out should track data size, not reader parallelism
    m = ds.materialize()
    nb = m.num_blocks()
    size = m.size_bytes() or 0
    target = max(1, min(nb, size // _SORT_TARGET_BLOCK_BYTES + 1))
    if nb > 4 * target:
        m = m.repartition(target)
    s = m.sort(keys).materialize()
    # skip Ray's column-less empty sort-range blocks: they would re-emit as
    # schema-poisoning blocks in the output (see conform_schema)
    refs = [
        ref
        for bundle in s.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]

    def _as_arrow(block) -> pa.Table:
        # blocks may be pandas (e.g. from_pandas inputs) — normalize
        return block if isinstance(block, pa.Table) else pa.Table.from_pandas(
            block, preserve_index=False
        )

    def _vals(t: pa.Table) -> "np.ndarray":
        # null → 0 (pc.sum semantics); safe cast raises on lossy floats
        col = pc.cast(pc.fill_null(t[value_col], 0), pa.int64())
        return col.to_numpy(zero_copy_only=False)

    @ray.remote
    def block_sum(block) -> int:
        t = _as_arrow(block)
        if t.num_rows == 0:
            return 0
        return int(_vals(t).sum())

    @ray.remote
    def block_cum(block, offset: int):
        t = _as_arrow(block)
        if t.num_rows == 0:
            return t
        # the block arrived sorted on keys (sort output); cumsum row order
        # IS key order
        return t.append_column(
            alias, pa.array(np.cumsum(_vals(t)) + offset, pa.int64())
        )

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums[:-1]))) if sums else []
    out = [block_cum.remote(r, int(o)) for r, o in zip(refs, offsets)]
    if not out:
        return s
    return ray.data.from_arrow_refs(out)


def sorted_combine(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    aggs: list[tuple[str, str]],
    renames: dict[str, str] | None = None,
    keep: Sequence[str] | None = None,
):
    """Exact grouped aggregate of per-block partials: range-sort on keys, then
    one vectorized pyarrow combine per block (see module docstring); key
    groups split across blocks are handled by group_safe_map."""
    keys = list(keys)
    renames = renames or {}

    def final(b: pa.Table) -> pa.Table:
        out = b.group_by(keys).aggregate(aggs)
        out = out.rename_columns([renames.get(c, c) for c in out.column_names])
        if keep is not None:
            out = out.select(list(keep))
        return out

    return group_safe_map(ds, keys, final)


def grouped_count(ds: "ray.data.Dataset", keys: Sequence[str], alias: str = "n"):
    """groupby(keys).count() with per-block combining (A1–A21 family)."""
    keys = list(keys)
    partial = _mb(ds, _partial(keys, [("", "count_all")]), batch_size=COMBINE_ROWS)
    return sorted_combine(
        partial, keys, [("count_all", "sum")],
        renames={"count_all_sum": alias}, keep=keys + [alias],
    )


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
    partial = _mb(
        ds,
        _partial(keys, [(col, "sum"), (col, "min"), (col, "max"), (col, "count")]),
        batch_size=COMBINE_ROWS,
    )
    aggs = [(f"{col}_count", "sum")]
    renames = {f"{col}_count_sum": count or "_n"}
    keep = list(keys) + ([count] if count else [])
    if sum_:
        aggs.append((f"{col}_sum", "sum"))
        renames[f"{col}_sum_sum"] = sum_
        keep.append(sum_)
    if min_:
        aggs.append((f"{col}_min", "min"))
        renames[f"{col}_min_min"] = min_
        keep.append(min_)
    if max_:
        aggs.append((f"{col}_max", "max"))
        renames[f"{col}_max_max"] = max_
        keep.append(max_)
    return sorted_combine(partial, keys, aggs, renames=renames, keep=keep)


def distinct_count(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    distinct: str | Sequence[str],
    alias: str = "n_distinct",
):
    """COUNT(DISTINCT distinct) GROUP BY keys (D1–D3 family).

    Two-phase: per-block dedup of (keys ∪ distinct) cuts shuffle volume, then
    a global sorted dedup; the per-keys count then combines the (already
    tiny) per-block distinct sets."""
    keys = list(keys)
    dcols = [distinct] if isinstance(distinct, str) else list(distinct)
    allk = list(dict.fromkeys(keys + dcols))

    deduped = _mb(ds, _partial(allk, []), batch_size=COMBINE_ROWS)
    global_dedup = sorted_combine(deduped, allk, [], keep=allk)
    if not keys:
        import pandas as pd

        return pd.DataFrame({alias: [int(global_dedup.count())]})
    partial = _mb(global_dedup, _partial(keys, [("", "count_all")]), batch_size=COMBINE_ROWS)
    return sorted_combine(
        partial, keys, [("count_all", "sum")],
        renames={"count_all_sum": alias}, keep=keys + [alias],
    )


def grouped_quantiles(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    *,
    count: str | None = "n",
):
    """Exact grouped quantiles via the distributed value histogram.

    Nearest-rank convention matching DuckDB ``quantile_disc``: the 1-based
    rank is ``ceil(q*n)`` evaluated in IEEE doubles (verified against DuckDB
    over an (n, q) grid — both engines do the same double multiply, so even
    epsilon-above-integer products agree), and the result is an ELEMENT of
    the column — integer in, integer out, so the value is hash-exact with no
    interpolation-rounding hazard.

    Scale shape: the full data reduces to a per-(keys, col-value) count table
    via the usual two-phase combine — the shuffle carries one row per
    distinct value per key per block, never raw rows — then one vectorized
    cumsum+searchsorted per key group picks all quantiles at once. Exact for
    any distribution; the per-group state is the VALUE HISTOGRAM (bounded by
    the value domain, e.g. integer µs), not the row count. For unbounded
    continuous domains the same rank-locate runs over sort+per-block counts
    instead; the reference itself has no quantiles (SURVEY §2.5) — this is
    part of the training-data/telemetry extension surface."""
    keys = list(keys)
    qs = list(qs)
    # %g keeps integral-percent labels unchanged (p50/p90/p99) and makes
    # fractional percents distinct (0.995 → p99_5) instead of silently
    # colliding on the rounded label
    labels = [f"p{q * 100:g}".replace(".", "_") for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels: {labels}")

    hist = grouped_count(
        _mb(ds, lambda t: t.select(keys + [col]).filter(pc.is_valid(t[col])),
            batch_size=COMBINE_ROWS),
        keys + [col],
        alias="_cnt",
    )

    import math

    import numpy as np
    import pandas as pd

    def pick(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(keys + [col], kind="stable")
        rows = []
        # dropna=False: null keys are groups here like in every pyarrow
        # group_by in this module (and in the DuckDB oracle)
        for kv, grp in df.groupby(keys, sort=False, dropna=False):
            c = grp["_cnt"].to_numpy()
            v = grp[col].to_numpy()
            cum = np.cumsum(c)
            n = int(cum[-1])
            row = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
            if count:
                row[count] = n
            for q, lab in zip(qs, labels):
                rank = min(max(math.ceil(q * n), 1), n)
                row[lab] = v[int(np.searchsorted(cum, rank))]
            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return group_safe_map(hist, keys, pick)


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

        ds = _mb(ds, local_topk, batch_size=COMBINE_ROWS)
    return ds.sort(by, descending=descending).limit(k)


def argmax_by(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: Sequence[bool],
):
    """Per-key argmax ROW (AG2 — the mpmstats record with max bsy per server,
    webErrorLogParser.sh:361-379): returns every column of the winning row.

    Two-phase like the other aggregates: per block, sort + ordered
    group_by('first') picks the local winner per key (one row per key per
    block into the shuffle); after the range sort on keys the same pick runs
    once per block for the global winner. Trailing order_by columns must
    make the ordering total for determinism (e.g. a turn_idx tiebreak)."""
    keys = list(keys)
    sort_spec = [(k, "ascending") for k in keys] + [
        (c, "descending" if d else "ascending") for c, d in zip(order_by, descending)
    ]

    def pick(b: pa.Table) -> pa.Table:
        val_cols = [c for c in b.column_names if c not in keys]
        b = b.sort_by(sort_spec)
        out = b.group_by(keys, use_threads=False).aggregate(
            [(c, "first") for c in val_cols]
        )
        return out.rename_columns(
            [c[: -len("_first")] if c.endswith("_first") else c for c in out.column_names]
        )

    partial = _mb(ds, pick, batch_size=COMBINE_ROWS)
    return group_safe_map(partial, keys, pick)


def pivot_counts(
    counts: "ray.data.Dataset",
    row_key: str,
    col_key: str,
    value: str,
    columns: Sequence[str],
):
    """Pivot a (row_key, col_key, value) count table wide with zero-fill
    (AG6 — fixed column dictionary like webAccessLogParser.sh:796,799).
    A re-sort on row_key ALONE precedes the per-block pivot: the count table
    arrives range-partitioned on (row_key, col_key), whose boundaries can
    split one row_key across blocks — group_safe_map on just row_key restores
    the all-rows-of-a-key-in-one-block invariant. The table is post-aggregate
    (small), so this sort is cheap."""
    columns = list(columns)

    def pivot_block(b: pa.Table) -> pa.Table:
        import pandas as pd

        # no empty-batch branch: group_safe_map's gen() wrapper never calls
        # the consumer on a zero-row batch
        df = b.to_pandas()
        wide = df.pivot_table(
            index=row_key, columns=col_key, values=value, aggfunc="sum", fill_value=0
        )
        out = {row_key: wide.index.to_numpy()}
        for c in columns:
            out[c] = (
                wide[c].to_numpy().astype("int64")
                if c in wide.columns
                else [0] * len(wide)
            )
        return pa.table(out)

    return group_safe_map(counts, [row_key], pivot_block)


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


ALERT_SCHEMA = pa.schema(
    [
        ("rule", pa.string()),
        ("key", pa.string()),
        ("value", pa.float64()),
        ("threshold", pa.float64()),
    ]
)


def threshold_alerts_ds(
    agg: "ray.data.Dataset",
    *,
    rule: str,
    key_col: str,
    value_col: str,
    threshold: float,
) -> "ray.data.Dataset":
    """Distributed J5: the threshold filter as a ``map_batches`` over the
    (already-distributed) aggregate Dataset — the reference streams alert
    lines to a sink file as it scans its per-key arrays
    (websphereLogParser.sh:345-379); nothing about the rule needs the rows
    on the driver. The threshold is a closure constant (shipped once per
    task by serialization), the filter is vectorized, and the output stays
    a Dataset — collect only at contract/report edges, where the alert set
    is bounded by the exceedance count, not the key cardinality."""

    def fn(t: pa.Table) -> pa.Table:
        hits = t.filter(
            pc.fill_null(pc.greater(t[value_col], threshold), False)
        )
        n = hits.num_rows
        return pa.table(
            {
                "rule": pa.array([rule] * n, pa.string()),
                "key": pc.cast(hits[key_col], pa.string()),
                "value": pc.cast(hits[value_col], pa.float64()),
                "threshold": pa.array([float(threshold)] * n, pa.float64()),
            }
        )

    return _mb(agg, fn)
