"""Training-data curation pipeline — the 100 TB-corpus composition.

Chains the training-data operators into the standard curation recipe:

    documents
      → exact dedup (md5 groupby)            keep min-doc_id survivor
      → MinHash-LSH near-dup clusters        keep cluster representative
      → quality filter (word count, stopword ratio)
      → curated corpus write + disposition report

Each doc gets exactly one disposition: kept, exact_dup, near_dup, or
low_quality (checked in that order — the reference's router-is-a-partition
property applied to curation). Every decision is a doc_id-keyed DATASET
joined back onto the quality table (``Dataset.join`` hash joins) — no
driver-side id sets, no full-table ``to_pandas()`` anywhere in the decision
path (round-1 postmortem: the id-set/broadcast-``is_in`` version held
O(corpus) ids on the driver). The kept-corpus write is a semi-join of the
documents table against the kept ids, so text moves through exactly one
shuffle and only for surviving docs.

Returns the disposition table + summary counts; optionally writes the
curated corpus as partitioned Parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.aggregate import conform_schema, grouped_count
from log_parser_ray.stages.dedup import JOIN_PARTITIONS, exact_dedup, minhash_clusters_ds
from log_parser_ray.stages.textops import quality_stats


def _flag(ds: "ray.data.Dataset", name: str) -> "ray.data.Dataset":
    """(…, doc_id, …) → (doc_id, <name>=True) join side."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], name: pa.array([True] * t.num_rows, pa.bool_())}
        )

    return conform_schema(
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("doc_id", pa.int64()), (name, pa.bool_())]),
    )


def run(
    docs: "ray.data.Dataset",
    out_dir: str | None = None,
    *,
    near_threshold: float = 0.9,
    min_words: int = 20,
    max_stop_ratio: float = 0.6,
    num_partitions: int = JOIN_PARTITIONS,
) -> dict:
    """Returns {"dispositions": DataFrame(doc_id, disposition),
    "summary": DataFrame(disposition, n), "kept": int}."""
    # 1. exact-dup survivors (min doc_id per distinct text) — flag Dataset
    survivors = _flag(exact_dedup(docs), "is_survivor")

    # 2. near-dup cluster representatives (cluster_id == doc_id) — flag Dataset
    clusters = minhash_clusters_ds(docs, threshold=near_threshold,
                                   num_partitions=num_partitions)
    reps = _flag(
        clusters.map_batches(
            lambda t: t.filter(pc.equal(t["doc_id"], t["cluster_id"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "is_rep",
    )

    # 3. quality table (one row per doc) is the join spine
    q = conform_schema(
        quality_stats(docs).select_columns(["doc_id", "n_words", "stop_ratio"]),
        pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                   ("stop_ratio", pa.float64())]),
    )

    j = q.join(survivors, "left_outer", num_partitions, on=("doc_id",))
    j = conform_schema(
        j, pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                      ("stop_ratio", pa.float64()), ("is_survivor", pa.bool_())])
    )
    j = j.join(reps, "left_outer", num_partitions, on=("doc_id",))

    def decide(t: pa.Table) -> pa.Table:
        surv = pc.fill_null(t["is_survivor"], False)
        rep = pc.fill_null(t["is_rep"], False)
        ok = pc.and_(
            pc.greater_equal(t["n_words"], min_words),
            pc.less_equal(t["stop_ratio"], max_stop_ratio),
        )
        disposition = pc.if_else(
            pc.invert(surv),
            pa.scalar("exact_dup"),
            pc.if_else(
                pc.invert(rep),
                pa.scalar("near_dup"),
                pc.if_else(ok, pa.scalar("kept"), pa.scalar("low_quality")),
            ),
        )
        return pa.table({"doc_id": t["doc_id"], "disposition": disposition})

    disp_ds = conform_schema(
        j.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("doc_id", pa.int64()), ("disposition", pa.string())]),
    )

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
        kept_ids = conform_schema(kept_ids, pa.schema([("doc_id", pa.int64())]))
        docs.join(kept_ids, "left_semi", num_partitions, on=("doc_id",)).write_parquet(
            out_dir
        )

    dispositions = disp_ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return {
        "dispositions": dispositions,
        "summary": summary,
        "kept": n_kept,
    }
