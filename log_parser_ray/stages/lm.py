"""CCNet-style n-gram LM perplexity scoring and head/middle/tail bucketing.

Implements the quality-filtering step of Wenzek et al. 2020 ("CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data", LREC
2020, arXiv:1911.00359 §4.3): score every document's perplexity under a
language model trained on a high-quality reference corpus, then split the
corpus into head / middle / tail by perplexity percentile (head = lowest
perplexity = closest to the reference). CCNet trains a KenLM 5-gram on
Wikipedia; this engine-native variant trains a hashed-bucket BIGRAM model
on the corpus' own reference subset (``lang == ref_lang`` — the same
"reference = the trusted slice" framing as stages/dsir.py) so the operator
is self-contained and exactly SQL-twinnable.

Model: P(w2 | w1) = (c_big(b(w1 w2)) + a) / (c_ctx(b(w1)) + a*B), add-a
smoothing over B = 65,536 md5 buckets (the repo's engine-exact hashing
idiom, shared with dsir/sketch). Per document with tokens t1..tn the score
is log_ppl = -(1/(n-1)) * sum_i ln P(t_{i+1} | t_i) — natural-log
perplexity; monotone in KenLM's log10 convention so the bucketing is
unchanged.

Scale shape (100-TB-first):

* both count models live in the FIXED 65,536-bucket space: one streamed
  bincount partial per batch over the reference slice, one bounded shuffle
  combine (<= 65,536 rows), two 512 KB float64 log-vectors broadcast once
  via ray.put.
* scoring is a pure map: a doc's bigrams never leave its task (each doc is
  one row, so the exploded stream stays batch-local); only the narrow
  (doc_id, n_big, log_ppl) projection materializes.
* the head/middle/tail thresholds are exact terciles over log_ppl QUANTIZED
  to centi-nats (floor(log_ppl*100) — a few thousand distinct values at any
  corpus size), so the distributed value-histogram quantile
  (aggregate.grouped_quantiles, DuckDB quantile_disc convention) stays
  bounded where a raw-double histogram would degenerate to one row per doc.
* the bucket mark is a second map over the materialized narrow projection
  with the two threshold ints closed over — no join, no re-tokenize.

log_ppl rounds to 6 digits (np.round = round-half-even = DuckDB
round_even) BEFORE quantize/rank on both engines, the repo's
float-exactness idiom; the SQL twin computes the per-bigram logprob in the
same ln(num) - ln(den) form so both engines sum identical doubles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.aggregate import grouped_quantiles, sorted_combine
from log_parser_ray.stages.textops import _explode_terms, _ngram_strings

N_BUCKETS = 65536  # 16-bit bucket = first 4 md5 hex chars of the gram
ALPHA = 0.5        # add-alpha smoothing over the full bucket space


def _md5_buckets(arr: pa.Array) -> np.ndarray:
    """md5[:4]-hex bucket index per element; md5 runs once per DISTINCT
    string in the batch (dictionary encode), not once per occurrence."""
    if len(arr) == 0:
        return np.array([], np.int64)
    enc = arr.dictionary_encode()
    dict_buckets = np.fromiter(
        (
            int(hashlib.md5(g.encode()).hexdigest()[:4], 16)
            for g in enc.dictionary.to_pylist()
        ),
        np.int64,
        len(enc.dictionary),
    )
    return dict_buckets[enc.indices.to_numpy(zero_copy_only=False)]


def _bigram_ctx_buckets(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bigram bucket, context-unigram bucket, parent doc row) per bigram
    occurrence of a batch. The context stream is the first token of each
    bigram — the same in-doc mask `_ngram_strings` applies, so the two
    arrays align element-wise."""
    flat, parent = _explode_terms(t)
    big, bparent = _ngram_strings(flat, parent, 2)
    m = len(flat) - 1
    if m <= 0 or len(big) == 0:
        return (
            np.array([], np.int64),
            np.array([], np.int64),
            np.array([], np.int64),
        )
    mask = pa.array(parent[:m] == parent[1:])
    ctx = flat.slice(0, m).filter(mask)
    return (
        _md5_buckets(big),
        _md5_buckets(ctx),
        np.asarray(bparent, dtype=np.int64),
    )


def bigram_lm_counts(
    docs: "ray.data.Dataset", ref_lang: str = "en"
) -> tuple[np.ndarray, np.ndarray]:
    """(bigram_counts, context_counts) — two length-65,536 int64 vectors
    over the reference slice (docs with lang == ref_lang). One streamed
    pass, bounded combine: the shuffle carries at most 65,536 rows per
    block whatever the corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["lang"], ref_lang))
        bb, cb, _ = _bigram_ctx_buckets(t)
        nb = np.bincount(bb, minlength=N_BUCKETS)
        nc = np.bincount(cb, minlength=N_BUCKETS)
        nz = np.flatnonzero(nb | nc)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "bn": pa.array(nb[nz], pa.int64()),
                "cn": pa.array(nc[nz], pa.int64()),
            }
        )

    part = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = sorted_combine(
        part, ["b"], [("bn", "sum"), ("cn", "sum")],
        renames={"bn_sum": "bn", "cn_sum": "cn"}, keep=["b", "bn", "cn"],
    ).to_pandas()  # bounded: <= 65,536 rows
    bn = np.zeros(N_BUCKETS, np.int64)
    cn = np.zeros(N_BUCKETS, np.int64)
    if len(agg):
        b = agg["b"].to_numpy()
        bn[b] = agg["bn"].to_numpy()
        cn[b] = agg["cn"].to_numpy()
    return bn, cn


def ccnet_perplexity(
    docs: "ray.data.Dataset", ref_lang: str = "en"
) -> "ray.data.Dataset":
    """Per-doc perplexity + CCNet head/middle/tail bucket for EVERY doc.

    Output: (doc_id, n_big, log_ppl, ppl_bucket). n_big = bigram count;
    log_ppl = natural-log perplexity rounded to 6 digits (null when the doc
    has < 2 tokens); ppl_bucket in {'head','middle','tail','empty'} —
    terciles of floor(log_ppl*100) over the n_big > 0 docs, boundary values
    going to the lower (better) bucket on both engines."""
    import ray

    bn, cn = bigram_lm_counts(docs, ref_lang)
    # per-bucket log numerator / denominator; lp(bigram) = lnum[bb] - lden[cb]
    model_ref = ray.put(
        (np.log(bn + ALPHA), np.log(cn + ALPHA * N_BUCKETS))
    )

    def score(t: pa.Table, ref=model_ref) -> pa.Table:
        import ray as _ray

        lnum, lden = _ray.get(ref)
        bb, cb, parent = _bigram_ctx_buckets(t)
        s = np.zeros(t.num_rows, np.float64)
        n = np.zeros(t.num_rows, np.int64)
        if len(bb):
            np.add.at(s, parent, lnum[bb] - lden[cb])
            n = np.bincount(parent, minlength=t.num_rows)
        has = n > 0
        log_ppl = np.round(-s / np.maximum(n, 1), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_big": pa.array(n, pa.int64()),
                "log_ppl": pa.array(
                    np.where(has, log_ppl, np.nan),
                    pa.float64(),
                    mask=~has,
                ),
            }
        )

    # narrow (doc_id, n_big, log_ppl) projection — materialized once so the
    # threshold pass and the bucket-mark pass don't each re-tokenize the
    # corpus (the dsir_weights idiom)
    scored = docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def quantize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_big"], 0))
        lq = np.floor(t["log_ppl"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table({"k": np.zeros(t.num_rows, np.int64),
                         "lq": pa.array(lq.astype(np.int64), pa.int64())})

    qt = grouped_quantiles(
        scored.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], "lq", [1 / 3, 2 / 3], count=None,
    ).to_pandas()
    if len(qt):
        t1 = int(qt.iloc[0, 1])
        t2 = int(qt.iloc[0, 2])
    else:  # no scorable docs: every row buckets as 'empty' below
        t1 = t2 = 0

    def mark(t: pa.Table, t1=t1, t2=t2) -> pa.Table:
        lq = np.floor(
            np.nan_to_num(t["log_ppl"].to_numpy(zero_copy_only=False)) * 100.0
        )
        has = t["n_big"].to_numpy(zero_copy_only=False) > 0
        bucket = np.where(
            ~has, "empty",
            np.where(lq <= t1, "head", np.where(lq <= t2, "middle", "tail")),
        )
        return t.append_column("ppl_bucket", pa.array(bucket, pa.string()))

    return scored.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
