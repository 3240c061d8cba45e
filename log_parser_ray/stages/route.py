"""Router / fan-out sinks.

The reference routes lines to per-category side files: `.process`, `.filter`,
`.tto`, `.hung`, discarded records, unknown user-agents (SURVEY.md IO4/IO7 —
webAccessLogParser.sh:652,683,1518-1557; websphereLogParser.sh:866-868).

Ray-native shape: routing is a *column* (`sink`, derived in the parse stage as
a strict partition of rows), and the fan-out is ONE streaming
``write_parquet(partition_cols=["sink"])`` pass — one Hive-partitioned
directory per sink, no per-sink rescans of the input.  Per-sink files are
bounded with ``min_rows_per_file`` so a 100 TB run emits a resumable layout
(out/sink=errors/part-*.parquet), never one giant file.
"""

from __future__ import annotations

import ray.data

from log_parser_ray.schema import (
    CATEGORY_NONE,
    CATEGORY_UNMATCHED,
    SINKS,
    TOOL_CATEGORIES,
)

# fixed enum orders for the GRAFT_NARROW_DICT int8 coding (probe lever);
# decode tables must match route→flagship, so both import these
SINK_ORDER: list[str] = list(SINKS)
CATEGORY_ORDER: list[str] = sorted(set(TOOL_CATEGORIES.values())) + [
    CATEGORY_UNMATCHED,
    CATEGORY_NONE,
]


def write_sinks(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    min_rows_per_file: int = 100_000,
    max_rows_per_file: int = 2_000_000,
) -> None:
    """Single-pass fan-out of routed rows to per-sink Parquet directories."""
    ds.write_parquet(
        out_dir,
        partition_cols=["sink"],
        min_rows_per_file=min_rows_per_file,
        max_rows_per_file=max_rows_per_file,
    )


def batch_fingerprint(batch) -> str:
    """Content-derived batch id — a Ray task retry reproduces the same name,
    so idempotent side writes never duplicate rows.

    On the transcript schema this is (row count, boundary (conv_id,
    turn_idx) rows incl. their text, turn-index sum) — byte-identical to
    what it always produced, so existing sink part names are stable. For
    any OTHER schema it derives the same shape from the batch itself (the
    first two columns as boundary keys, the first integer column as the
    checksum column, the first string column for boundary text) instead of
    KeyError'ing on a hardcoded column list — write_batch_parquet is
    documented as a generic unkeyed side-write helper."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    n = batch.num_rows
    h = hashlib.md5()
    names = batch.column_names
    key_cols = (
        ["conv_id", "turn_idx"]
        if "conv_id" in names and "turn_idx" in names
        else names[:2]
    )
    txt_col = "text" if "text" in names else next(
        (c for c in names if pa.types.is_string(batch.schema.field(c).type)
         or pa.types.is_large_string(batch.schema.field(c).type)),
        None,
    )
    sum_col = "turn_idx" if "turn_idx" in names else next(
        (c for c in names
         if pa.types.is_integer(batch.schema.field(c).type)), None,
    )
    first_txt = batch[txt_col][0].as_py() if txt_col else ""
    last_txt = batch[txt_col][n - 1].as_py() if txt_col else ""
    turn_sum = (pc.sum(batch[sum_col]).as_py() or 0) if sum_col else 0
    # ordering preserved for the transcript schema: n:c0:t0:cN:tN:sum:txts
    if key_cols == ["conv_id", "turn_idx"]:
        bounds = (
            f"{batch['conv_id'][0]}:{batch['turn_idx'][0]}:"
            f"{batch['conv_id'][n - 1]}:{batch['turn_idx'][n - 1]}"
        )
    else:
        bounds = ":".join(
            f"{batch[c][0]}:{batch[c][n - 1]}" for c in key_cols
        )
    h.update(
        f"{n}:{bounds}:{turn_sum}:{first_txt}:{last_txt}".encode(
            "utf-8", "surrogatepass"
        )
    )
    return h.hexdigest()[:16]


def write_batch_parquet(batch, out_dir: str) -> None:
    """Idempotent single-file side write (content-derived name, tmp +
    os.replace commit) — the write_batch_sinks mechanics for an unkeyed
    side output (e.g. the unknown-UA review sink)."""
    import os

    import pyarrow.parquet as pq

    if batch.num_rows == 0:
        return
    os.makedirs(out_dir, exist_ok=True)
    fp = batch_fingerprint(batch)
    comp = os.environ.get("GRAFT_SINK_COMPRESSION", "zstd")
    kw = {"compression_level": 1} if comp == "zstd" else {}
    tmp = os.path.join(out_dir, f".tmp-part-{fp}.parquet")
    pq.write_table(batch, tmp, compression=None if comp == "none" else comp, **kw)
    os.replace(tmp, os.path.join(out_dir, f"part-{fp}.parquet"))


def write_batch_sinks(batch, out_dir: str) -> None:
    """Write ONE routed batch to the per-sink hive layout
    (``out/sink=<s>/part-<fp>.parquet``), skipping the ``sink`` column inside
    the file (it is the partition key, matching write_parquet(partition_cols)).

    Filenames are CONTENT-derived (row count, boundary (conv_id, turn_idx)
    rows incl. their text, and the turn-index sum), so a Ray task retry
    rewrites the same file instead of duplicating rows — the mv-commit
    idempotency of the reference (webAccessLogParser.sh:1518-1557) at batch
    granularity; files land via tmp + os.replace so a mid-write crash never
    leaves a truncated part at the final path. The ``sink`` column must be
    TOTAL (non-null for every row) — enforced, since a null sink would
    silently land in no partition."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if batch.num_rows == 0:
        return
    fp = batch_fingerprint(batch)
    if pc.any(pc.is_null(batch["sink"])).as_py():
        raise ValueError("write_batch_sinks: null sink value (routing must be total)")
    enc = batch["sink"].combine_chunks().dictionary_encode()
    body = batch.drop_columns(["sink"])
    for i, s in enumerate(enc.dictionary.to_pylist()):
        sub = body.filter(pc.equal(enc.indices, i))
        d = os.path.join(out_dir, f"sink={s}")
        os.makedirs(d, exist_ok=True)
        # zstd: ~2× smaller text payloads than snappy for a little CPU —
        # trades shared-memory-bus bytes (the single-box scaling ceiling,
        # BASELINE.md) for per-core compute, and halves the 100 TB sink.
        # GRAFT_SINK_COMPRESSION overrides for the ceiling probes
        # (tools/ceiling_probe.py): zstd (default) | snappy | none.
        comp = os.environ.get("GRAFT_SINK_COMPRESSION", "zstd")
        kw = {"compression_level": 1} if comp == "zstd" else {}
        final = os.path.join(d, f"part-{fp}.parquet")
        tmp = os.path.join(d, f".tmp-part-{fp}.parquet")
        pq.write_table(sub, tmp,
                       compression=None if comp == "none" else comp, **kw)
        os.replace(tmp, final)


class EnrichWriteProject:
    """Fused enrich + sink-write + narrow-projection actor — the flagship hot
    path. Parse (stateless maps) fuses into this pool, so the full-width
    routed rows exist only INSIDE the task: they are written straight to the
    per-sink parquet layout and only the narrow aggregate columns are
    emitted. Text-bearing blocks therefore never transit or pin the object
    store (round-1 scaling postmortem: shipping `text` through shared memory
    for reports that never read it capped single-box scaling at 0.45)."""

    def __init__(self, out_dir: str, narrow_cols: list[str],
                 tool_categories_ref=None, role_severities_ref=None):
        from log_parser_ray.stages.enrich import Enricher

        self._enrich = Enricher(tool_categories_ref, role_severities_ref)
        self.out_dir = out_dir
        self.narrow_cols = list(narrow_cols)
        # int8 coding is only sound against the DEFAULT category table —
        # a custom broadcast lookup may emit values outside CATEGORY_ORDER
        self._codable = tool_categories_ref is None

    def __call__(self, batch):
        import os

        full = self._enrich(batch)
        write_batch_sinks(full, self.out_dir)
        out = full.select(self.narrow_cols)
        if self._codable and os.environ.get("GRAFT_NARROW_DICT", "1") == "1":
            # Default ON (BASELINE.md round-4 probe: pairwise +5..+33%,
            # median +15% flagship throughput at 16 CPUs): encode the
            # low-cardinality enum strings of the materialized narrow blocks
            # as int8 CODES (category ≤ 5, sink ≤ 7 values) — cuts bytes/row
            # through the shared object store, the measured single-box
            # ceiling. Plain int8, not Arrow dictionary type: Ray's range
            # sort rejects dictionary columns. flagship.run decodes on the
            # tiny post-aggregate tables. GRAFT_NARROW_DICT=0 disables.
            import pyarrow as pa
            import pyarrow.compute as pc

            for c, order in (("sink", SINK_ORDER), ("category", CATEGORY_ORDER)):
                if c in out.column_names:
                    i = out.column_names.index(c)
                    codes = pc.cast(
                        pc.fill_null(
                            pc.index_in(out[c], value_set=pa.array(order)), -1
                        ),
                        pa.int8(),
                    )
                    out = out.set_column(i, c, codes)
        return out


# Single-slot (key, instance) cache: a worker only ever serves one run's
# stage parameters at a time, and an unbounded dict would leak one
# EnrichWriteProject (plus its broadcast lookup dicts) per distinct out_dir
# across a long-lived worker's repeated pipeline runs.
_FUSED_CACHE: list = [None, None]


def enrich_write_project(batch, *, out_dir: str, narrow_cols: tuple,
                         tool_categories_ref=None, role_severities_ref=None):
    """Task-pool variant of :class:`EnrichWriteProject` — a plain FUNCTION so
    Ray fuses it (and the stateless parse maps) INTO the ReadParquet tasks:
    the text-bearing blocks are born, parsed, enriched, written to the sink
    layout and projected to the narrow columns inside ONE task, so they never
    transit the object store even once. (The actor-pool form cannot fuse with
    the read — actors are a separate operator — which left exactly one
    store round-trip for the full-width blocks: read task → store → actor.
    On one box that round-trip is the shared-memory traffic that caps
    flagship scaling; see BASELINE.md.)

    Setup state (broadcast lookup dicts) is cached per WORKER PROCESS keyed
    by the stage parameters — same construct-once economics as the actor
    ``__init__``, without forfeiting read fusion."""
    key = (out_dir, tuple(narrow_cols), tool_categories_ref, role_severities_ref)
    if _FUSED_CACHE[0] != key:
        # construct FIRST, publish the key after: a constructor exception
        # (e.g. a transient ray.get in Enricher) must not leave the key
        # pointing at a stale/None instance for the task retry
        inst = EnrichWriteProject(
            out_dir, list(narrow_cols),
            tool_categories_ref=tool_categories_ref,
            role_severities_ref=role_severities_ref,
        )
        _FUSED_CACHE[1] = inst
        _FUSED_CACHE[0] = key
    return _FUSED_CACHE[1](batch)


