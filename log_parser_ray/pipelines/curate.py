"""Training-data curation pipeline — the 100 TB-corpus composition.

Chains the training-data operators into the standard curation recipe:

    documents
      → exact dedup (md5 groupby)            keep min-doc_id survivor
      → MinHash-LSH near-dup clusters        keep cluster representative
      → quality filter (word count, stopword ratio)
      → curated corpus write + disposition report

Each doc gets exactly one disposition: kept, exact_dup, near_dup, or
low_quality (checked in that order — the reference's router-is-a-partition
property applied to curation). Every decision stays a doc_id-keyed DATASET —
no driver-side id sets anywhere in the decision path (round-1 postmortem:
the id-set/broadcast-``is_in`` version held O(corpus) ids on the driver).

Join strategy: the survivor/representative flags attach to the quality
spine in ONE fused range-sort pass (union of tagged sides + group_safe_map
on doc_id) — the round-2 version paid two sequential ``Dataset.join``
barriers here, each spawning a fresh hash-shuffle actor pool (~3.5 s fixed
cost per join, BASELINE.md profile). The kept-corpus write is a sort-merge
semi-join of the documents table against the kept ids, so text moves
through exactly one shuffle and only for surviving docs.

Returns the disposition DATASET (collect at the contract edge, not here),
plus the (tiny, per-disposition) summary counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.aggregate import (
    group_safe_map,
    grouped_count,
    merge_join,
)
from log_parser_ray.stages.dedup import exact_dedup, minhash_clusters_ds
from log_parser_ray.stages.textops import quality_stats

# tagged-union sides for the fused flag-attach sort
_SIDE_Q, _SIDE_SURVIVOR, _SIDE_REP = 0, 1, 2


def _tag(ds: "ray.data.Dataset", side: int) -> "ray.data.Dataset":
    """Conform a flag/spine table to the shared (doc_id, side, n_words,
    stop_ratio) layout; flag sides carry nulls for the quality columns."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        has_q = side == _SIDE_Q
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "n_words": t["n_words"] if has_q else pa.nulls(n, pa.int64()),
                "stop_ratio": t["stop_ratio"] if has_q else pa.nulls(n, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def run(
    docs: "ray.data.Dataset",
    out_dir: str | None = None,
    *,
    near_threshold: float = 0.9,
    min_words: int = 20,
    max_stop_ratio: float = 0.6,
) -> dict:
    """Returns {"dispositions": Dataset(doc_id, disposition),
    "summary": DataFrame(disposition, n), "kept": int}."""
    # 1. exact-dup survivors (min doc_id per distinct text)
    survivors = exact_dedup(docs).select_columns(["doc_id"])

    # 2. near-dup cluster representatives (cluster_id == doc_id)
    clusters = minhash_clusters_ds(docs, threshold=near_threshold)
    reps = clusters.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["cluster_id"])).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # 3. quality table (one row per doc) is the spine; flags attach and the
    # disposition is decided in ONE range-sort pass over the tagged union
    q = quality_stats(docs).select_columns(["doc_id", "n_words", "stop_ratio"])
    tagged = (
        _tag(q, _SIDE_Q)
        .union(_tag(survivors, _SIDE_SURVIVOR))
        .union(_tag(reps, _SIDE_REP))
    )

    def decide(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        spine = df[df["side"] == _SIDE_Q]
        is_surv = spine["doc_id"].isin(df.loc[df["side"] == _SIDE_SURVIVOR, "doc_id"])
        is_rep = spine["doc_id"].isin(df.loc[df["side"] == _SIDE_REP, "doc_id"])
        ok = (spine["n_words"] >= min_words) & (spine["stop_ratio"] <= max_stop_ratio)
        disposition = np.where(
            ~is_surv,
            "exact_dup",
            np.where(~is_rep, "near_dup", np.where(ok, "kept", "low_quality")),
        )
        return pa.table(
            {
                "doc_id": pa.array(spine["doc_id"].to_numpy(), pa.int64()),
                "disposition": pa.array(disposition, pa.string()),
            }
        )

    disp_ds = group_safe_map(tagged, ["doc_id"], decide).materialize()

    summary = (
        grouped_count(disp_ds, ["disposition"], alias="n")
        .to_pandas()
        .sort_values("disposition")
        .reset_index(drop=True)
    )
    n_kept = int(
        summary.loc[summary["disposition"] == "kept", "n"].sum()
    )

    if out_dir is not None:
        kept_ids = disp_ds.map_batches(
            lambda t: t.filter(pc.equal(t["disposition"], "kept")).select(["doc_id"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        merge_join(
            docs, kept_ids, on="doc_id", how="left_semi",
            left_schema=docs.schema().base_schema,
            right_schema=pa.schema([("doc_id", pa.int64())]),
        ).write_parquet(out_dir)

    return {
        "dispositions": disp_ds,
        "summary": summary,
        "kept": n_kept,
    }
