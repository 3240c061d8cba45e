"""Training-data curation pipeline — the 100 TB-corpus composition.

Chains the training-data operators into the standard curation recipe:

    documents
      → exact dedup (md5 groupby)            keep min-doc_id survivor
      → MinHash-LSH near-dup clusters        keep cluster representative
      → quality filter (word count, stopword ratio)
      → curated corpus write + disposition report

Each doc gets exactly one disposition: kept, exact_dup, near_dup, or
low_quality (checked in that order — the reference's router-is-a-partition
property applied to curation). The decision tables are doc_id-keyed sets;
here they broadcast into the final filter (ints, tiny next to the text); at
corpus scale each becomes a hash join on doc_id instead.

Returns the disposition table + summary counts; optionally writes the
curated corpus as partitioned Parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.dedup import exact_dedup, minhash_clusters
from log_parser_ray.stages.textops import quality_stats


def run(
    docs: "ray.data.Dataset",
    out_dir: str | None = None,
    *,
    near_threshold: float = 0.9,
    min_words: int = 20,
    max_stop_ratio: float = 0.6,
) -> dict:
    """Returns {"dispositions": DataFrame(doc_id, disposition),
    "summary": DataFrame(disposition, n), "kept": int}."""
    # 1. exact-dup survivors (min doc_id per distinct text)
    exact = exact_dedup(docs).to_pandas()
    survivors = set(exact["doc_id"].astype(int))

    # 2. near-dup cluster representatives (cluster_id == doc_id)
    clusters = minhash_clusters(docs, threshold=near_threshold)
    representatives = set(
        clusters.loc[clusters["doc_id"] == clusters["cluster_id"], "doc_id"].astype(int)
    )

    # 3. quality pass
    q = quality_stats(docs).to_pandas()
    quality_ok = set(
        q.loc[
            (q["n_words"] >= min_words) & (q["stop_ratio"] <= max_stop_ratio),
            "doc_id",
        ].astype(int)
    )

    all_ids = q["doc_id"].astype(int)
    disposition = np.where(
        ~all_ids.isin(survivors),
        "exact_dup",
        np.where(
            ~all_ids.isin(representatives),
            "near_dup",
            np.where(~all_ids.isin(quality_ok), "low_quality", "kept"),
        ),
    )
    dispositions = pd.DataFrame({"doc_id": all_ids, "disposition": disposition})
    dispositions = dispositions.sort_values("doc_id").reset_index(drop=True)
    summary = (
        dispositions.groupby("disposition").size().reset_index(name="n")
        .sort_values("disposition").reset_index(drop=True)
    )

    kept_ids = set(
        dispositions.loc[dispositions["disposition"] == "kept", "doc_id"]
    )
    if out_dir is not None:
        keep_arr = pa.array(sorted(kept_ids), pa.int64())

        def keep_filter(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["doc_id"], value_set=keep_arr))

        docs.map_batches(
            keep_filter, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).write_parquet(out_dir)

    return {
        "dispositions": dispositions,
        "summary": summary,
        "kept": int(len(kept_ids)),
    }
