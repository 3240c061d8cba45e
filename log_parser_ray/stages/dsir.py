"""DSIR-style data selection via hashed n-gram importance weights.

Implements the importance weight of Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling", NeurIPS 2023, arXiv:2302.03169):
bag-of-hashed-ngrams (unigrams + bigrams) generative models for a small
TARGET domain and the RAW corpus; per-document importance weight
= sum over the document's gram occurrences of
log p_target(bucket) - log p_raw(bucket); then selection — either the
deterministic rank-by-weight top-k (``dsir_weights``) or the paper's
Gumbel-top-k importance resample with md5-seeded noise
(``dsir_resample``), ties broken by doc_id in both.

Scale shape (100-TB-first):

* the bucket space is FIXED (65,536 buckets = first 4 md5 hex chars of the
  gram — the engine-exact idiom shared with sketch.sample_by_hash), so both
  count models are bounded regardless of corpus size: one streamed
  partial-bincount per batch, one bounded shuffle combine (<= 65,536 rows),
  and the log-ratio vector (512 KB float64) broadcasts once via ray.put.
* the weighing pass is a pure map: grams explode per batch, md5 runs once
  per DISTINCT gram per batch (dictionary encode), np.add.at accumulates
  per-doc weights; a doc's grams never leave its task, so the corpus text
  itself is never shuffled.
* selection is the block-pruned distributed top_k — only k (doc_id, weight)
  rows reach the driver, and only the k-id set broadcasts back.

Weights are rounded to 6 digits (the repo's float-exactness idiom) and every
step has a value-exact DuckDB twin (md5-hex buckets, ln ratios, window
ranking) — see __ray_entry__.oracle_sql()["dsir_weights"].
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.aggregate import sorted_combine, top_k, _mb, _partial
from log_parser_ray.stages.textops import _explode_terms, _ngram_strings

N_BUCKETS = 65536  # 16-bit bucket = first 4 md5 hex chars of the gram
ALPHA = 0.5        # add-alpha smoothing over the full bucket space


def _bucket_ids(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(bucket index, parent doc row) for every unigram AND bigram
    occurrence of a batch. md5 runs once per distinct gram in the batch
    (dictionary encode), not once per occurrence."""
    flat, parent = _explode_terms(t)
    bi, bi_parent = _ngram_strings(flat, parent, 2)
    grams = pa.concat_arrays([flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat, bi])
    parents = np.concatenate(
        [np.asarray(parent, dtype=np.int64), np.asarray(bi_parent, dtype=np.int64)]
    )
    if len(grams) == 0:
        return np.array([], np.int64), parents
    enc = grams.dictionary_encode()
    dict_buckets = np.fromiter(
        (
            int(hashlib.md5(g.encode()).hexdigest()[:4], 16)
            for g in enc.dictionary.to_pylist()
        ),
        np.int64,
        len(enc.dictionary),
    )
    return dict_buckets[enc.indices.to_numpy(zero_copy_only=False)], parents


def bucket_count_models(
    docs: "ray.data.Dataset", target_lang: str = "en"
) -> tuple[np.ndarray, np.ndarray]:
    """(target_counts, raw_counts) — two length-65,536 int64 vectors.

    One streamed pass: per batch a bincount partial over non-zero buckets,
    then a bounded shuffle combine (the output can never exceed 65,536
    rows, whatever the corpus size). Target = docs with lang ==
    target_lang; raw = every doc."""

    def partial(t: pa.Table) -> pa.Table:
        idx, parent = _bucket_ids(t)
        is_tgt = pc.equal(t["lang"], target_lang).to_numpy(zero_copy_only=False)
        raw = np.bincount(idx, minlength=N_BUCKETS)
        tgt = (
            np.bincount(idx[is_tgt[parent]], minlength=N_BUCKETS)
            if len(idx)
            else np.zeros(N_BUCKETS, np.int64)
        )
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "tn": pa.array(tgt[nz], pa.int64()),
                "rn": pa.array(raw[nz], pa.int64()),
            }
        )

    part = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = sorted_combine(
        part, ["b"], [("tn", "sum"), ("rn", "sum")],
        renames={"tn_sum": "tn", "rn_sum": "rn"}, keep=["b", "tn", "rn"],
    ).to_pandas()  # bounded: <= 65,536 rows
    tgt = np.zeros(N_BUCKETS, np.int64)
    raw = np.zeros(N_BUCKETS, np.int64)
    if len(agg):
        b = agg["b"].to_numpy()
        tgt[b] = agg["tn"].to_numpy()
        raw[b] = agg["rn"].to_numpy()
    return tgt, raw


def log_ratio_vector(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """ln p_target(b) - ln p_raw(b) with add-ALPHA smoothing over the full
    N_BUCKETS space (unseen buckets get the constant prior ratio)."""
    T = int(tgt.sum())
    R = int(raw.sum())
    return np.log((tgt + ALPHA) / (T + ALPHA * N_BUCKETS)) - np.log(
        (raw + ALPHA) / (R + ALPHA * N_BUCKETS)
    )


def dsir_weights(
    docs: "ray.data.Dataset", target_lang: str = "en", k: int = 100
) -> "ray.data.Dataset":
    """Per-doc DSIR importance weight + deterministic top-k selection flag.

    Output: (doc_id, weight, selected) for EVERY document (gram-less docs
    weigh 0.0 and rank with everyone else); selected = rank <= k under
    (weight desc, doc_id asc) on the 6-digit-rounded weight — the rounding
    happens BEFORE ranking on both engines so the order is ulp-stable."""
    import ray

    tgt, raw = bucket_count_models(docs, target_lang)
    lr_ref = ray.put(log_ratio_vector(tgt, raw))

    def weigh(t: pa.Table, ref=lr_ref) -> pa.Table:
        import ray as _ray

        lrv = _ray.get(ref)
        idx, parent = _bucket_ids(t)
        w = np.zeros(t.num_rows, np.float64)
        if len(idx):
            np.add.at(w, parent, lrv[idx])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "weight": pa.array(np.round(w, 6), pa.float64()),
            }
        )

    # narrow (doc_id, weight) projection — materialized once so the top-k
    # rank pass and the flag pass don't each re-tokenize the corpus (16
    # bytes/doc; the flagship narrow-projection idiom)
    weights = docs.map_batches(
        weigh, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sel = top_k(
        weights, by=["weight", "doc_id"], descending=[True, False], k=k
    ).to_pandas()
    sel_ids = pa.array(sel["doc_id"].to_numpy(), pa.int64())

    def mark(t: pa.Table, ids=sel_ids) -> pa.Table:
        return t.append_column("selected", pc.is_in(t["doc_id"], value_set=ids))

    return weights.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)


def _uniform_md5(doc_ids, salt: str = "g0") -> np.ndarray:
    """Deterministic uniform in (0,1) per doc: the first 4 md5 bytes of
    'doc_id|salt' as a big-endian u32, midpoint-shifted — engine-exact (the
    sample_by_hash idiom widened to 32 bits)."""
    suffix = "|" + salt
    vals = np.fromiter(
        (
            int(hashlib.md5((str(d) + suffix).encode()).hexdigest()[:8], 16)
            for d in doc_ids
        ),
        np.float64,
        len(doc_ids),
    )
    return (vals + 0.5) / 4294967296.0


def dsir_resample(
    docs: "ray.data.Dataset",
    target_lang: str = "en",
    k: int = 100,
    salt: str = "g0",
) -> "ray.data.Dataset":
    """DSIR's actual selection step — Gumbel-top-k importance RESAMPLING
    (Xie et al. 2023 §2; Gumbel-top-k samples k docs without replacement
    with probability proportional to the softmax of the log importance
    weights): key = weight + Gumbel(0,1), take the top k. The Gumbel noise
    is seeded from md5(doc_id|salt), so the sample is deterministic,
    block-layout invariant, and SQL-twinned (the gumbel key rounds to 6
    digits BEFORE ranking on both engines, ties broken by doc_id).

    Output: (doc_id, weight, key, selected) for every document."""
    import ray

    tgt, raw = bucket_count_models(docs, target_lang)
    lr_ref = ray.put(log_ratio_vector(tgt, raw))

    def weigh(t: pa.Table, ref=lr_ref) -> pa.Table:
        import ray as _ray

        lrv = _ray.get(ref)
        idx, parent = _bucket_ids(t)
        w = np.zeros(t.num_rows, np.float64)
        if len(idx):
            np.add.at(w, parent, lrv[idx])
        w = np.round(w, 6)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        u = _uniform_md5(ids, salt)
        gumbel = -np.log(-np.log(u))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "weight": pa.array(w, pa.float64()),
                "key": pa.array(np.round(w + gumbel, 6), pa.float64()),
            }
        )

    keyed = docs.map_batches(
        weigh, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sel = top_k(
        keyed, by=["key", "doc_id"], descending=[True, False], k=k
    ).to_pandas()
    sel_ids = pa.array(sel["doc_id"].to_numpy(), pa.int64())

    def mark(t: pa.Table, ids=sel_ids) -> pa.Table:
        return t.append_column("selected", pc.is_in(t["doc_id"], value_set=ids))

    return keyed.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
