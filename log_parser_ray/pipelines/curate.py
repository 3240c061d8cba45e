"""Training-data curation pipeline — the 100 TB-corpus composition.

Chains the training-data operators into the standard curation recipe:

    documents
      → exact dedup (md5 fingerprint)         keep min-doc_id survivor
      → MinHash-LSH near-dup clusters         keep cluster representative
      → quality filter (word count, stopword ratio)
      → curated corpus write + disposition report

Each doc gets exactly one disposition: kept, exact_dup, near_dup, or
low_quality (checked in that order — the reference's router-is-a-partition
property applied to curation). Every decision stays a doc_id-keyed DATASET —
no driver-side id sets anywhere in the decision path.

SINGLE-SCAN shape (round-3 verdict #2): the corpus is read and tokenized
exactly ONCE — ``minhash_clusters_ds(with_quality=True)`` computes the md5
fingerprint (exact-dup groups), the MinHash signatures AND the quality
metrics in the same batch pass, and its output carries per doc:

    cluster_id != doc_id  ⇔  not a representative
    sdoc       != doc_id  ⇔  exact duplicate (not the min-id of its text)
    n_words / stop_ratio  →  kept vs low_quality

so the disposition is ONE vectorized ``map_batches`` over the cluster
table — the round-3 version ran three independent full-text scans
(exact_dedup + clusters + quality_stats) plus a 3-way tagged-union sort.
The kept-corpus write is a sort-merge semi-join of the documents table
against the kept ids, so text moves through exactly one shuffle and only
for surviving docs.

Returns the disposition DATASET (collect at the contract edge, not here),
plus the (tiny, per-disposition) summary counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.aggregate import grouped_count, merge_join
from log_parser_ray.stages.dedup import minhash_clusters_ds


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
    clusters = minhash_clusters_ds(
        docs, threshold=near_threshold, with_quality=True
    )

    def decide(t: pa.Table) -> pa.Table:
        doc = t["doc_id"]
        is_exact_dup = pc.not_equal(t["sdoc"], doc)
        is_near_dup = pc.not_equal(t["cluster_id"], doc)
        ok = pc.and_(
            pc.greater_equal(t["n_words"], min_words),
            pc.less_equal(t["stop_ratio"], max_stop_ratio),
        )
        # ordered partition: exact_dup → near_dup → kept/low_quality.
        # (cluster_id ≤ sdoc ≤ doc_id, so a non-survivor is never a
        # representative — the order only decides which label it reports.)
        disposition = np.select(
            [
                is_exact_dup.to_numpy(zero_copy_only=False),
                is_near_dup.to_numpy(zero_copy_only=False),
                ok.to_numpy(zero_copy_only=False),
            ],
            ["exact_dup", "near_dup", "kept"],
            default="low_quality",
        )
        return pa.table(
            {
                "doc_id": pc.cast(doc, pa.int64()),
                "disposition": pa.array(disposition, pa.string()),
            }
        )

    disp_ds = clusters.map_batches(
        decide, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

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
        from log_parser_ray.state.manifest import fresh_dir

        merge_join(
            docs, kept_ids, on="doc_id", how="left_semi",
            left_schema=docs.schema().base_schema,
            right_schema=pa.schema([("doc_id", pa.int64())]),
            # fresh_dir: a rerun replaces the curated output, never
            # accumulates a second uuid-named file set next to stale rows
        ).write_parquet(fresh_dir(out_dir))

    return {
        "dispositions": disp_ds,
        "summary": summary,
        "kept": n_kept,
    }
