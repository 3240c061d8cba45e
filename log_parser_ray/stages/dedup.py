"""Deduplication operators — exact and near-dup — over a document table.

Scale design (100 TB corpus):

* **exact**: md5 fingerprint per doc (map_batches) → groupby(fp) keeps the
  min-doc_id survivor. The shuffle moves ONE short hash row per doc, never
  the text. This is hash-partitioned dedup — the only all-to-all is on the
  16-byte key.
* **near-dup, the scale path = MinHash + LSH**: shingle → 64 minhash values
  (chunked ``np.minimum.reduceat`` over the whole batch's token hashes — no
  per-doc Python) → 16 bands × 4 rows; each band's numpy-mixed 64-bit hash
  is a bucket key. The shuffle is groupby(bucket) over (bucket, doc_id)
  pairs — no text movement. Candidate pairs come out of buckets; the exact
  Jaccard verify is a DISTRIBUTED sort-merge join of the pair table against
  the per-doc token-hash table on doc_id (two task-based range-sort passes,
  ``aggregate.merge_join`` — no per-call shuffle-actor spawn), so no step
  collects the corpus to the driver. One tokenize pass feeds both the
  signatures and the verify blobs. Precision is 1.0 by construction; recall
  follows the banding S-curve (P[candidate] = 1-(1-j^rows)^bands).
* **near-dup clusters**: per-bucket edges to the bucket minimum (O(bucket),
  the SlimPajama/RefinedWeb recipe), verified the same way (the verify's
  first sort pass also dedupes the raw edges), then connected components by
  ITERATED DISTRIBUTED min-label propagation — each round is one sort-merge
  message pass plus one groupby-min; convergence is detected from the
  label-sum scalar (labels only ever decrease). Docs in no verified edge
  become singletons via a left-outer merge_join; cluster sizes attach in
  one window-count sort pass.
* **near-dup, exact oracle-checkable variant**: inverted-index pairwise
  Jaccard (groupby(token) emits co-occurrence pairs). Exact but O(pairs);
  used for small/medium side paths and as the verification oracle for LSH.
* **SimHash**: 64-bit fingerprint; candidates share one of 4 16-bit segments
  (Hamming ≤ 3 ⇒ pigeonhole: some segment is identical), verified by exact
  Hamming distance.

Reference analogue: the reference only has exact set-dedup via AWK assoc
arrays (SURVEY.md §2.7); the near-dup family is the training-data extension.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.textops import WORD_RE, fingerprint

MERSENNE_P = (1 << 61) - 1
N_PERM = 64
LSH_BANDS = 16
LSH_ROWS = N_PERM // LSH_BANDS
# Retained for API compatibility only: joins in this module are task-based
# sort-merge passes (aggregate.merge_join) whose fan-out follows the data.
JOIN_PARTITIONS = 8

_word = re.compile(WORD_RE)

# token → 64-bit hash, cached once per WORKER PROCESS (md5 runs once per
# distinct token ever seen by the worker; bounded to keep long-lived workers
# from growing without limit on open-vocabulary corpora)
_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_CAP = 1 << 20


def token_set(text: str) -> set[str]:
    return set(_word.findall(text.lower()))


def _hash_tokens(tokens) -> np.ndarray:
    """Stable 64-bit hashes (md5-derived, process-independent), cached."""
    cache = _TOKEN_CACHE
    if len(cache) > _TOKEN_CACHE_CAP:
        cache.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            cache[t] = h
        out[i] = h
    return out


def _perm_params(n_perm: int = N_PERM, seed: int = 42):
    rs = np.random.RandomState(seed)
    a = rs.randint(1, MERSENNE_P, size=n_perm, dtype=np.uint64)
    b = rs.randint(0, MERSENNE_P, size=n_perm, dtype=np.uint64)
    return a, b


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct-content survivors: (fp, doc_id=min, n_copies) per unique text.

    Shuffle key is the md5 fingerprint — identical texts land in one group
    regardless of where they were read; survivor choice (min doc_id) is
    deterministic under any parallelism."""
    from log_parser_ray.stages.aggregate import sorted_combine

    fps = fingerprint(docs).select_columns(["doc_id", "fp"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["fp"])
            .aggregate([("doc_id", "min"), ([], "count_all")])
        )

    part = fps.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return sorted_combine(
        part,
        ["fp"],
        [("doc_id_min", "min"), ("count_all", "sum")],
        renames={"doc_id_min_min": "doc_id", "count_all_sum": "n_copies"},
        keep=["fp", "doc_id", "n_copies"],
    )


def incremental_dedup(
    new_docs: "ray.data.Dataset", prior_docs: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Dedupe a NEW snapshot against a PRIOR corpus (crawl-refresh shape).

    Returns the new snapshot's within-snapshot exact-dedup survivors
    ``(fp, doc_id, n_copies)`` whose content fingerprint does not appear
    anywhere in the prior corpus. The standard incremental-ingest pattern
    (CCNet/Dolma re-crawls): the prior corpus contributes ONLY its distinct
    fingerprints — its payloads are never re-shuffled — so each refresh
    costs one fp scan of the old data plus a fingerprint-keyed anti-join,
    not a full re-dedup of old ∪ new. At 100 TB the prior side's distinct-fp
    table is the persisted artifact of the previous run (exact_dedup's own
    output), making the prior scan free; accepting raw docs here keeps the
    API symmetric for callers that don't retain it."""
    from log_parser_ray.stages.aggregate import merge_join

    surv = exact_dedup(new_docs)
    prior_fps = exact_dedup(prior_docs).select_columns(["fp"])
    return merge_join(
        surv,
        prior_fps,
        on="fp",
        left_schema=pa.schema(
            [("fp", pa.string()), ("doc_id", pa.int64()),
             ("n_copies", pa.int64())]
        ),
        right_schema=pa.schema([("fp", pa.string())]),
        how="left_anti",
    )


def _pairs_from_buckets(
    ds: "ray.data.Dataset",
    bucket_col: str,
    id_col: str,
    payload_col: str | None = None,
) -> "ray.data.Dataset":
    """(bucket, id[, payload]) → candidate pairs (a_id, b_id[, a_pl, b_pl]).

    Shape: group_safe_map on the bucket (range sort; equal buckets share a
    batch) with ONE vectorized emission per batch — group segmentation
    inside the batch is numpy, so there is no per-group Python/pandas task
    overhead (the ``groupby().map_groups`` equivalent measured ~1 ms per
    bucket — ruinous at thousands of LSH buckets)."""

    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        empty = {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
        }
        if payload_col:
            ptype = b.schema.field(payload_col).type
            empty["a_pl"] = pa.array([], ptype)
            empty["b_pl"] = pa.array([], ptype)
        if n < 2:
            return pa.table(empty)
        buckets = np.asarray(b[bucket_col])
        ids = np.asarray(b[id_col])
        payload = np.asarray(b[payload_col]) if payload_col else None
        order = np.lexsort((ids, buckets))
        buckets, ids = buckets[order], ids[order]
        if payload is not None:
            payload = payload[order]
        # drop duplicate (bucket, id) rows
        keep = np.ones(n, dtype=bool)
        keep[1:] = (buckets[1:] != buckets[:-1]) | (ids[1:] != ids[:-1])
        buckets, ids = buckets[keep], ids[keep]
        if payload is not None:
            payload = payload[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], buckets[1:] != buckets[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(buckets)]))
        ai_all, bi_all = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            ai_all.append(ai + s)
            bi_all.append(bi + s)
        if not ai_all:
            return pa.table(empty)
        ai = np.concatenate(ai_all)
        bi = np.concatenate(bi_all)
        out = {
            "a_id": pa.array(ids[ai], pa.int64()),
            "b_id": pa.array(ids[bi], pa.int64()),
        }
        if payload is not None:
            out["a_pl"] = pa.array(payload[ai])
            out["b_pl"] = pa.array(payload[bi])
        return pa.table(out)

    from log_parser_ray.stages.aggregate import group_safe_map

    return group_safe_map(ds, [bucket_col], fn)


# ---------------------------------------------------------------------------
# exact pairwise Jaccard via inverted index


def tokenize_distinct(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, w) — the distinct token set of each doc, exploded."""

    def fn(t: pa.Table) -> pa.Table:
        ids, words = [], []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in token_set(s):
                ids.append(d)
                words.append(w)
        # explicit string type: a batch of only token-less docs would
        # otherwise emit a null-typed 'w' column and poison the schema
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "w": pa.array(words, pa.string())}
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def jaccard_pairs(
    docs: "ray.data.Dataset", threshold: float = 0.95
) -> pd.DataFrame:
    """All pairs (a_id < b_id) with token-set Jaccard ≥ threshold — exact.

    groupby(token) → co-occurrence pairs → count = |A∩B|; per-doc set sizes
    are a small side table broadcast into the final jaccard computation.
    Returns a pandas DataFrame (pair results are small relative to input).
    Inherently O(pairs) — the small/verify path; LSH above is the scale
    route (at web scale you'd add prefix filtering)."""
    from log_parser_ray.stages.aggregate import grouped_count

    tok = tokenize_distinct(docs)
    sizes = grouped_count(tok, ["doc_id"], alias="n").to_pandas()
    size_map = dict(zip(sizes["doc_id"], sizes["n"]))

    pairs = _pairs_from_buckets(tok, "w", "doc_id")
    inter = grouped_count(pairs, ["a_id", "b_id"], alias="i").to_pandas()
    if len(inter) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "i", "u", "jac"])
    na = inter["a_id"].map(size_map).to_numpy()
    nb = inter["b_id"].map(size_map).to_numpy()
    inter["u"] = na + nb - inter["i"]
    inter["jac"] = (inter["i"] / inter["u"]).round(6)
    out = inter[inter["jac"] >= threshold].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    docs: "ray.data.Dataset", n_perm: int = N_PERM, batch_size: int = 4096,
    *, with_token_hashes: bool = False, with_fingerprint: bool = False,
    with_quality: bool = False,
):
    """(doc_id, sig: fixed_size_list<uint64>[n_perm]) — batch-vectorized.

    All tokens of the batch are hashed once (process-cached) into one flat
    uint64 array; (a·h + b) mod p is evaluated for every (perm, token) of a
    bounded doc-chunk at once and per-doc minima come from
    ``np.minimum.reduceat`` — no per-doc Python in the hash arithmetic.

    ``with_token_hashes=True`` additionally emits each doc's sorted distinct
    raw token hashes as a binary blob (``th``, the ``doc_token_hashes``
    layout) — the verify stage's input — so the corpus is TOKENIZED ONCE for
    both the signatures and the exact-Jaccard verify.

    Arithmetic note: ``(a·h + b) mod p`` evaluates in uint64, so the product
    WRAPS mod 2⁶⁴ before the mod-p reduction (a, h < 2⁶¹). The effective
    hash family is ``((a·h + b) mod 2⁶⁴) mod p`` — deterministic, shared
    verbatim with the SQL oracle's HUGEINT twin, but not strictly the
    textbook min-wise-independent family, so the banding S-curve is an
    approximation; precision is unaffected (the exact verify gates every
    pair)."""
    a, b = _perm_params(n_perm)
    # chunk sized so the (n_perm × tokens) temporaries stay CACHE-resident:
    # 64 × 4096 × 8 B ≈ 2 MB. Measured on this box: the same arithmetic over
    # a 128k-token chunk (48 MB temporaries) runs ~100× slower — the shared
    # memory subsystem, not the ALU, is the constraint (BASELINE.md note).
    chunk_tokens = 1 << 12

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        tok_lists = [list(token_set(s)) for s in texts]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64, n)
        sigs = np.full((n, n_perm), np.uint64(MERSENNE_P), dtype=np.uint64)
        ths: list[bytes | None] = [b""] * n if with_token_hashes else []
        nonempty = np.flatnonzero(lens > 0)
        i = 0
        while i < len(nonempty):
            # greedy doc-chunk whose token total fits the budget
            j, total = i, 0
            while j < len(nonempty) and (total == 0 or total + lens[nonempty[j]] <= chunk_tokens):
                total += lens[nonempty[j]]
                j += 1
            docs_ix = nonempty[i:j]
            raw = _hash_tokens([tok for d in docs_ix for tok in tok_lists[d]])
            starts = np.zeros(len(docs_ix), dtype=np.int64)
            np.cumsum(lens[docs_ix[:-1]], out=starts[1:])
            if with_token_hashes:
                ends = np.concatenate((starts[1:], [len(raw)]))
                for d, s0, e0 in zip(docs_ix, starts, ends):
                    ths[d] = np.sort(raw[s0:e0]).tobytes()
            flat = raw % np.uint64(MERSENNE_P)
            # (n_perm, total_tokens) hash matrix, then per-doc segment minima
            vals = (flat[None, :] * a[:, None] + b[:, None]) % np.uint64(MERSENNE_P)
            mins = np.minimum.reduceat(vals, starts, axis=1)  # (n_perm, n_docs)
            sigs[docs_ix, :] = mins.T
            i = j
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), n_perm
        )
        cols = {"doc_id": t["doc_id"], "sig": sig_arr}
        if with_token_hashes:
            cols["th"] = pa.array(ths, pa.binary())
        if with_fingerprint:
            # the SAME fingerprint as textops.fingerprint/exact_dedup — the
            # exact-dedup-first clustering depends on these staying identical
            from log_parser_ray.stages.textops import md5_hex

            cols["fp"] = pa.array(md5_hex(texts), pa.string())
        if with_quality:
            # curation's quality metrics ride the SAME batch (single-scan
            # curation, round-3 verdict #2) — the ONE shared kernel with
            # textops.quality_stats, so the SQL twin cannot drift
            from log_parser_ray.stages.textops import quality_arrays

            n_words, _, ratio = quality_arrays(t["text"])
            cols["n_words"] = n_words
            cols["stop_ratio"] = ratio
        return pa.table(cols)

    return docs.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def lsh_buckets(signatures: "ray.data.Dataset", bands: int = LSH_BANDS):
    """Explode signatures to (bucket: uint64, doc_id) — bucket = mixed band
    hash, seeded by the band index. Pure numpy (the round-1 per-row md5 of
    band bytes was the stage's hot loop); bucket collisions across bands
    only add candidates that the exact verify removes."""

    def fn(t: pa.Table) -> pa.Table:
        sigs = np.asarray(t["sig"].combine_chunks().flatten()).reshape(
            t.num_rows, -1
        )
        rows_per_band = sigs.shape[1] // bands
        ids = t["doc_id"].to_numpy()
        n = len(ids)
        out_b = np.empty(bands * n, dtype=np.uint64)
        mul = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix constant
        for band in range(bands):
            seed = ((band + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            h = np.full(n, np.uint64(seed))
            seg = sigs[:, band * rows_per_band : (band + 1) * rows_per_band]
            for c in range(rows_per_band):
                h = (h ^ seg[:, c]) * mul
                h ^= h >> np.uint64(33)
            out_b[band * n : (band + 1) * n] = h
        out_d = np.tile(ids, bands)
        return pa.table(
            {"bucket": pa.array(out_b, pa.uint64()), "doc_id": pa.array(out_d, pa.int64())}
        )

    return signatures.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _tokened(sigs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Drop token-less docs (empty ``th``) before LSH bucketing: they all
    share the identical all-sentinel signature, so n of them pour into ONE
    bucket per band — O(bands·n²) candidate pairs (a 100k-doc non-Latin or
    punctuation-only slice would OOM the pair emitter) even though every
    such pair verifies to jac=0 and can never pass a positive threshold.
    Dropped docs still reach the output as singletons via the doc spine /
    survivor mapping."""
    return sigs.map_batches(
        lambda t: t.filter(pc.greater(pc.binary_length(t["th"]), 0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def doc_token_hashes(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, th: binary) — each doc's sorted distinct 64-bit token hashes
    as raw little-endian bytes. binary, not list<uint64>: Acero hash joins
    reject list-typed payload columns, and the byte blob round-trips through
    ``np.frombuffer`` zero-copy."""

    def fn(t: pa.Table) -> pa.Table:
        ths = [
            np.sort(_hash_tokens(list(token_set(s)))).tobytes()
            for s in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "th": pa.array(ths, pa.binary())})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def verify_pairs(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    th_ds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Exact Jaccard for (distinct) candidate pairs — fully distributed.

    Two sort-merge passes (task-based — no per-join shuffle-actor spawn)
    attach each side's token-hash blob to the pair row (the pair table
    shuffles on a_id then b_id; the doc table ships its hash blobs, never
    its text), then a vectorized-per-batch pass intersects the sorted hash
    arrays. The first pass also DEDUPES the candidate pairs exactly — all
    rows of an ``a_id`` are co-located after the range sort, so distinct
    (a_id, b_id) is a per-batch group_by there, and callers don't need a
    separate distinct-pair shuffle. Nothing is collected to the driver.

    ``th_ds``: optional pre-computed (doc_id, th) table (e.g. emitted by
    ``minhash_signatures(with_token_hashes=True)``) so the corpus isn't
    tokenized a second time."""
    from log_parser_ray.stages.aggregate import group_safe_map, merge_join

    th = (th_ds if th_ds is not None else doc_token_hashes(docs)).materialize()
    th_schema = pa.schema([("doc_id", pa.int64()), ("th", pa.binary())])

    # pass 1 (hand-rolled): key = a_id; th rows carry a blob and a null
    # b_id, pair rows the reverse — one range sort co-locates them
    def tag_th(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["doc_id"], "b_id": pa.nulls(t.num_rows, pa.int64()),
             "a_th": t["th"]}
        )

    def tag_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["a_id"], "b_id": t["b_id"],
             "a_th": pa.nulls(t.num_rows, pa.binary())}
        )

    uni = th.map_batches(tag_th, batch_format="pyarrow", zero_copy_batch=True).union(
        pairs.map_batches(tag_pairs, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach_a(b: pa.Table) -> pa.Table:
        is_pair = pc.is_valid(b["b_id"])
        prs = (
            b.filter(is_pair)
            .select(["key", "b_id"])
            .group_by(["key", "b_id"])  # exact distinct: a_id co-located
            .aggregate([])
        )
        blobs = b.filter(pc.invert(is_pair)).select(["key", "a_th"])
        out = prs.join(blobs, keys=["key"], join_type="inner")
        return pa.table(
            {"a_id": out["key"], "b_id": out["b_id"], "a_th": out["a_th"]}
        )

    j = group_safe_map(uni, ["key"], attach_a)
    j = merge_join(
        j, th, on="b_id", right_on="doc_id", how="inner",
        left_schema=pa.schema(
            [("a_id", pa.int64()), ("b_id", pa.int64()), ("a_th", pa.binary())]
        ),
        right_schema=th_schema,
    )

    def jac_fn(t: pa.Table) -> pa.Table:
        a_th = t["a_th"].to_pylist()
        b_th = t["th"].to_pylist()
        n = t.num_rows
        inter = np.empty(n, dtype=np.int64)
        union = np.empty(n, dtype=np.int64)
        for i in range(n):
            x = np.frombuffer(a_th[i], dtype=np.uint64)
            y = np.frombuffer(b_th[i], dtype=np.uint64)
            # both blobs are stored SORTED — membership via searchsorted
            # (O(m log n)), not intersect1d's concatenate-and-re-sort
            if len(x) > len(y):
                x, y = y, x
            if len(y):
                ix = np.searchsorted(y, x)
                ix[ix == len(y)] = 0
                k = int(np.count_nonzero(y[ix] == x))
            else:
                k = 0
            inter[i] = k
            union[i] = max(len(x) + len(y) - k, 1)
        return pa.table(
            {
                "a_id": t["a_id"],
                "b_id": t["b_id"],
                "i": pa.array(inter),
                "u": pa.array(union),
                "jac": pa.array(np.round(inter / union, 6)),
            }
        )

    return j.map_batches(jac_fn, batch_format="pyarrow", zero_copy_batch=True)


def _distinct_pairs(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    from log_parser_ray.stages.aggregate import sorted_combine

    return sorted_combine(pairs, ["a_id", "b_id"], [], keep=["a_id", "b_id"])


def minhash_near_dups(
    docs: "ray.data.Dataset", threshold: float = 0.9
) -> pd.DataFrame:
    """MinHash-LSH candidate pairs, verified by exact Jaccard ≥ threshold.

    Pipeline: one tokenize pass emits signatures + token-hash blobs → band
    buckets (map_batches) → groupby(bucket) pair emission → DISTRIBUTED
    sort-merge verify (verify_pairs, which also dedupes the candidates).
    Precision is 1.0 by construction; recall follows the banding S-curve.
    Returns pandas (pair results are small AFTER the distributed threshold
    filter — sub-threshold candidates never reach the driver)."""
    sigs = minhash_signatures(docs, with_token_hashes=True).materialize()
    buckets = lsh_buckets(_tokened(sigs))
    cand = _pairs_from_buckets(buckets, "bucket", "doc_id")
    verified = verify_pairs(cand, docs, th_ds=sigs).map_batches(
        lambda t, th=threshold: t.filter(pc.greater_equal(t["jac"], th)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    if len(verified) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "i", "u", "jac"])
    return verified.sort_values(["a_id", "b_id"]).reset_index(drop=True)


CC_SINGLE_TASK_MAX_EDGES = 2_000_000


def _cc_single_task(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Small-regime connected components: union-find over the whole edge
    table inside ONE Ray task (repartition(1) + map). Not a driver
    materialization — the edge list never leaves the cluster; it is simply
    small enough (≤ CC_SINGLE_TASK_MAX_EDGES) that iterative distributed
    propagation would be pure shuffle overhead."""

    def uf(b: pa.Table) -> pa.Table:
        a = b["a_id"].to_numpy()
        c = b["b_id"].to_numpy()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(a, c):
            x, y = int(x), int(y)
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by MIN id so the label is the component minimum
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
        nodes = {int(v) for v in a} | {int(v) for v in c}
        out_n = np.fromiter(nodes, np.int64, len(nodes))
        out_l = np.fromiter((find(int(v)) for v in out_n), np.int64, len(out_n))
        return pa.table({"node": pa.array(out_n), "label": pa.array(out_l)})

    return edges.repartition(1).map_batches(
        uf, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _connected_components(
    edges: "ray.data.Dataset", max_iter: int = 25,
) -> "ray.data.Dataset":
    """(a_id, b_id) edge Dataset → (node, label=min id of its component).

    Two regimes: a verified near-dup edge table that fits one task
    (≤ CC_SINGLE_TASK_MAX_EDGES rows) runs union-find in a single Ray task;
    larger tables run iterated distributed min-label propagation — each
    round a sort-merge message pass (sender's label to every neighbor) plus
    a groupby-min. Labels only ever decrease, so the label-sum scalar is a
    convergence certificate. Rounds needed = component diameter — small by
    construction here (bucket-min star edges). Covers only nodes with ≥1
    edge; callers add singletons via anti-join."""
    edges = edges.materialize()
    if edges.count() <= CC_SINGLE_TASK_MAX_EDGES:
        return _cc_single_task(edges)
    from log_parser_ray.stages.aggregate import (
        conform_schema,
        group_safe_map,
        sorted_combine,
    )

    lbl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    sym_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["a_id"], "dst": t["b_id"]})

    def bwd(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["b_id"], "dst": t["a_id"]})

    sym = conform_schema(
        edges.map_batches(fwd, batch_format="pyarrow", zero_copy_batch=True)
        .union(edges.map_batches(bwd, batch_format="pyarrow", zero_copy_batch=True)),
        sym_schema,
    ).materialize()

    def combine_min(d):
        return conform_schema(
            sorted_combine(d, ["node"], [("label", "min")],
                           renames={"label_min": "label"}),
            lbl_schema,
        )

    # init: label = min(node, min neighbor) — one combine, saves a round
    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["src"], "label": pc.min_element_wise(t["src"], t["dst"])}
        )

    labels = combine_min(
        sym.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()

    # one propagation round = a SORT-MERGE message pass (cheaper than a hash
    # join per round): union the edge rows with the label rows keyed by the
    # sender, co-locate per key via group_safe_map, and emit every sender's
    # label to each neighbor plus itself; then groupby-min per receiver.
    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["src"], "dst": t["dst"],
             "label": pa.nulls(t.num_rows, pa.int64())}
        )

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["node"], "dst": pa.nulls(t.num_rows, pa.int64()),
             "label": t["label"]}
        )

    tag_schema = pa.schema(
        [("key", pa.int64()), ("dst", pa.int64()), ("label", pa.int64())]
    )

    def emit(b: pa.Table) -> pa.Table:
        # int64 all the way: nullable columns read via is_valid + fill_null
        # (a to_numpy of a nullable int64 becomes float64, which silently
        # corrupts ids ≥ 2^53)
        key = np.asarray(b["key"])
        is_lab = pc.is_valid(b["label"]).to_numpy(zero_copy_only=False)
        dst = pc.fill_null(b["dst"], -1).to_numpy(zero_copy_only=False)
        lab = pc.fill_null(b["label"], -1).to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, dst, lab, is_lab = key[order], dst[order], lab[order], is_lab[order]
        new_grp = np.concatenate(([True], key[1:] != key[:-1]))
        gid = np.cumsum(new_grp) - 1
        # exactly one label row per key (labels covers every sym src)
        glab = np.full(gid[-1] + 1 if len(gid) else 0, -1, dtype=np.int64)
        glab[gid[is_lab]] = lab[is_lab]
        per_row = glab[gid]
        e = ~is_lab
        nodes = np.concatenate((dst[e], key[is_lab]))
        labs = np.concatenate((per_row[e], lab[is_lab]))
        return pa.table(
            {"node": pa.array(nodes, pa.int64()), "label": pa.array(labs, pa.int64())}
        )

    tagged_edges = conform_schema(
        sym.map_batches(tag_edges, batch_format="pyarrow", zero_copy_batch=True),
        tag_schema,
    ).materialize()
    prev_sum = labels.sum("label")
    converged = False
    for _ in range(max_iter):
        tagged = tagged_edges.union(
            labels.map_batches(tag_labels, batch_format="pyarrow", zero_copy_batch=True)
        )
        prop = group_safe_map(tagged, ["key"], emit)
        labels = combine_min(prop).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # propagation advances one hop per round; silently returning here
        # would emit WRONG labels (split components) for a graph whose
        # diameter exceeds max_iter — fail loud instead
        raise RuntimeError(
            f"label propagation did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds the round budget); rerun "
            "with a larger max_iter"
        )
    return labels


def minhash_clusters_ds(
    docs: "ray.data.Dataset", threshold: float = 0.9,
    *, with_quality: bool = False,
) -> "ray.data.Dataset":
    """Scalable MinHash-LSH dedup: near-dup CLUSTERS as a Dataset.

    A dense near-dup corpus makes the pairwise output inherently quadratic
    (n near-identical docs ⇒ n²/2 pairs). The production shape avoids it:
    per LSH bucket emit only EDGES to the bucket's minimum doc_id
    (O(bucket size), never O(size²)), verify each edge's exact Jaccard with
    the distributed sort-merge verify (which also dedupes the raw edges),
    then connected components by distributed label propagation. Output:
    (doc_id, cluster_id=min doc in component, cluster_size). No driver-side
    materialization anywhere — the round-1 token_sets dict and pandas CC
    fixpoint are gone.

    EXACT-DEDUP-FIRST (the published recipe order — SlimPajama/RefinedWeb
    run exact dedup before MinHash): one fp-keyed sort co-locates identical
    texts and the near-dup machinery runs over DISTINCT texts only; copies
    inherit their survivor's component through the (doc_id, sdoc) mapping.
    Without this, a dup-heavy corpus multiplies bucket edges and the
    verify stage's blob shuffle by the copy count — measured 70 s for 320 k
    docs (64 exact copies each) vs ~12 s with the dedup-first shape
    (tools/dedup_scale_probe.py). The component PARTITION is provably
    unchanged: exact copies share every band bucket, so LSH-over-all-docs
    connects them to exactly the components their survivor joins, and
    cluster_id = component-min doc id either way — the SQL oracle
    (LSH over all docs) therefore still matches value-for-value.

    ``with_quality=True`` additionally carries each doc's (sdoc, n_words,
    stop_ratio) into the output — computed in the SAME tokenize batch as the
    signatures, so curation needs exactly ONE scan of the corpus (round-3
    verdict #2): sdoc != doc_id is the exact-dup flag, cluster_id != doc_id
    the near-dup flag, and the quality columns decide kept/low_quality."""
    extras = ["n_words", "stop_ratio"] if with_quality else []

    # lazy: group_safe_map materializes its input, so the (sig, th, fp)
    # table is pinned ONCE (as `mapped`), not twice
    sigs = minhash_signatures(
        docs, with_token_hashes=True, with_fingerprint=True,
        with_quality=with_quality,
    )

    # one sort on fp: attach sdoc = min doc_id of each identical-text group
    def attach_sdoc(b: pa.Table) -> pa.Table:
        df = b.select(["doc_id", "fp"]).to_pandas()
        sdoc = df.groupby("fp", sort=False)["doc_id"].transform("min").to_numpy()
        return b.append_column("sdoc", pa.array(sdoc, pa.int64()))

    from log_parser_ray.stages.aggregate import group_safe_map

    mapped = group_safe_map(sigs, ["fp"], attach_sdoc).materialize()
    mapping = mapped.select_columns(["doc_id", "sdoc"] + extras)
    surv_sigs = mapped.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["sdoc"])).select(
            ["doc_id", "sig", "th"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    buckets = lsh_buckets(_tokened(surv_sigs))

    def edges_fn(b: pa.Table) -> pa.Table:
        bk = np.asarray(b["bucket"])
        ids = np.asarray(b["doc_id"])
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
        ends = np.concatenate((starts[1:], [len(bk)]))
        a_all, b_all = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            mn = ids[s]  # sorted: min doc_id of the bucket
            others = ids[s + 1 : e]
            others = others[others != mn]  # cross-band collision → self-edge
            if not len(others):
                continue
            a_all.append(others)
            b_all.append(np.full(len(others), mn, dtype=np.int64))
        if not a_all:
            return pa.table(
                {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(a_all), pa.int64()),
                "b_id": pa.array(np.concatenate(b_all), pa.int64()),
            }
        )

    from log_parser_ray.stages.aggregate import merge_join, with_group_size

    def self_cluster(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t["doc_id"], "cluster_id": t["sdoc"]}
        if with_quality:
            cols["sdoc"] = t["sdoc"]
            for c in extras:
                cols[c] = t[c]
        return pa.table(cols)

    raw_edges = group_safe_map(buckets, ["bucket"], edges_fn).materialize()
    if raw_edges.count() == 0:
        # no candidate buckets: every doc's component is its exact-dup group
        all_lab = mapping.map_batches(
            self_cluster, batch_format="pyarrow", zero_copy_batch=True
        )
        return with_group_size(all_lab, ["cluster_id"], alias="cluster_size")
    verified = verify_pairs(raw_edges, docs, th_ds=surv_sigs)
    edges = verified.map_batches(
        lambda t, th=threshold: t.filter(pc.greater_equal(t["jac"], th)).select(
            ["a_id", "b_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    labels = _connected_components(edges)

    def as_cluster(t: pa.Table) -> pa.Table:
        return pa.table({"sdoc": t["node"], "cluster_id": t["label"]})

    from log_parser_ray.stages.aggregate import conform_schema

    # conform: if every candidate edge fails the threshold, labels is an
    # all-empty dataset whose schema-less blocks would poison the join union
    clustered = conform_schema(
        labels.map_batches(as_cluster, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("sdoc", pa.int64()), ("cluster_id", pa.int64())]),
    )

    # one left-outer sort-merge join on the SURVIVOR id attaches each doc's
    # component label; survivors in no verified edge (and all their exact
    # copies) fall back to the survivor id — which IS the component minimum
    # for a pure exact-dup group
    extra_fields = [("n_words", pa.int64()), ("stop_ratio", pa.float64())] if with_quality else []
    withlab = merge_join(
        mapping, clustered, on="sdoc", how="left_outer",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("sdoc", pa.int64())] + extra_fields
        ),
        right_schema=pa.schema([("sdoc", pa.int64()), ("cluster_id", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t["doc_id"],
                "cluster_id": pc.coalesce(t["cluster_id"], t["sdoc"])}
        if with_quality:
            cols["sdoc"] = t["sdoc"]
            for c in extras:
                cols[c] = t[c]
        return pa.table(cols)

    all_lab = withlab.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True,
    )

    # window count(*) over cluster_id in one sort pass — replaces
    # grouped_count + a join back onto the label table
    return with_group_size(all_lab, ["cluster_id"], alias="cluster_size")


# NOTE: minhash_clusters_ds is the primary (Dataset-returning) API; pandas
# collection of the per-doc label table happens only at contract edges
# (__ray_entry__ / tests), never inside the package.


# ---------------------------------------------------------------------------
# SimHash candidates


def simhash_candidate_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3
) -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Bucketing: split the 64-bit fingerprint into (max_hamming+1) segments;
    any pair within distance d ≤ max_hamming agrees on ≥1 segment
    (pigeonhole), so groupby(segment value) generates all candidates, then
    exact popcount verifies. Same shuffle shape as LSH banding."""
    from log_parser_ray.stages.textops import simhash64

    n_seg = max_hamming + 1
    seg_bits = 64 // n_seg

    fps = simhash64(docs.select_columns(["doc_id", "text"])).select_columns(
        ["doc_id", "simhash"]
    )

    def explode(t: pa.Table) -> pa.Table:
        # vectorized: parse hex once, then one shift/mask + one string-join
        # kernel per segment (n_seg tables concatenated; no per-doc loop)
        n = t.num_rows
        hs = np.array(
            [int(x, 16) for x in t["simhash"].to_pylist()], dtype=np.uint64
        )
        mask = np.uint64((1 << seg_bits) - 1)
        parts = []
        for s in range(n_seg):
            seg = (hs >> np.uint64(s * seg_bits)) & mask
            bucket = pc.binary_join_element_wise(
                f"{s}:",
                pc.cast(pa.array(seg, pa.uint64()), pa.string()),
                "",
            )
            parts.append(
                pa.table(
                    {"bucket": bucket, "doc_id": t["doc_id"],
                     "h": pa.array(hs, pa.uint64())}
                )
            )
        return pa.concat_tables(parts)

    exploded = fps.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    raw_pairs = _pairs_from_buckets(exploded, "bucket", "doc_id", payload_col="h")

    def hamming(b: pa.Table) -> pa.Table:
        x = np.asarray(b["a_pl"]).astype(np.uint64) ^ np.asarray(b["b_pl"]).astype(
            np.uint64
        )
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        return pa.table(
            {"a_id": b["a_id"], "b_id": b["b_id"], "hamming": pa.array(ham)}
        )

    pairs = raw_pairs.map_batches(
        hamming, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    from log_parser_ray.stages.aggregate import sorted_combine

    dedup = sorted_combine(
        pairs,
        ["a_id", "b_id"],
        [("hamming", "min")],
        renames={"hamming_min": "hamming"},
        keep=["a_id", "b_id", "hamming"],
    ).to_pandas()
    out = dedup[dedup["hamming"] <= max_hamming].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True)


def line_dedup(
    docs: "ray.data.Dataset",
    min_docs: int = 2,
) -> "ray.data.Dataset":
    """Line-level boilerplate removal (the RefinedWeb / CCNet line-dedup
    step): a line (split on ``\\n``, exact text) that occurs in at least
    ``min_docs`` DISTINCT documents is boilerplate ("Share this article",
    cookie banners, nav menus) and is removed from EVERY document; surviving
    lines re-join in order. Documents whose every line was boilerplate drop
    from the output (the SQL twin's GROUP BY does the same). Empty lines
    never count as boilerplate. No reference analogue (the reference has
    only whole-record set-dedup, SURVEY §2.7) — this is the LLM-pipeline
    extension at sub-document granularity.

    Scale shape: the explode is one in-task ``split_pattern`` + zero-copy
    flatten; the boilerplate census is a two-phase distinct on
    (line, doc_id) then a grouped count — shuffles move (line, id) pairs,
    nothing else; removal is a distributed sort-merge ANTI join on the
    exact line text (never a broadcast — the boilerplate table grows with
    the corpus); reassembly is a group-safe per-doc pass (range sort on
    doc_id, split groups coalesced). Nothing collects to the driver."""
    from log_parser_ray.stages.aggregate import (
        _mb,
        group_safe_map,
        grouped_count,
        merge_join,
        sorted_combine,
    )

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], "\n")
        flat = pc.list_flatten(toks).combine_chunks()
        parent = pc.list_parent_indices(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.cumsum(lens) - lens
        line_no = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            starts, lens
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].take(parent),
                "line_no": pa.array(line_no, pa.int64()),
                "line": flat,
            }
        )

    # materialize the exploded lines ONCE: both the census and the anti
    # join consume them (a lazy chain would re-split every doc twice)
    lines = _mb(docs.select_columns(["doc_id", "text"]), explode).materialize()

    def census_partial(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.not_equal(t["line"], ""))
        return (
            pa.table({"line": sub["line"], "doc_id": sub["doc_id"]})
            .group_by(["line", "doc_id"]).aggregate([])
        )

    distinct = sorted_combine(
        _mb(lines, census_partial),
        ["line", "doc_id"], [], keep=["line", "doc_id"],
    )
    boiler = _mb(
        grouped_count(distinct, ["line"], alias="nd"),
        lambda t: t.filter(
            pc.greater_equal(t["nd"], min_docs)).select(["line"]),
    )

    kept = merge_join(
        lines, boiler, on="line", how="left_anti",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("line_no", pa.int64()),
             ("line", pa.string())]
        ),
        right_schema=pa.schema([("line", pa.string())]),
    )

    def reassemble(t: pa.Table) -> pa.Table:
        t = t.sort_by([("doc_id", "ascending"), ("line_no", "ascending")])
        g = t.group_by(["doc_id"], use_threads=False).aggregate(
            [("line", "list")]
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "text": pc.binary_join(g["line_list"], "\n"),
            }
        )

    out = group_safe_map(kept, ["doc_id"], reassemble)
    # an all-boilerplate corpus leaves ONLY schema-less empty blocks (Ray
    # never calls a map fn on an empty batch), which drop the (doc_id, text)
    # schema from to_pandas/joins downstream; seed one typed empty block so
    # the schema survives regardless of content. O(1) — no materialize.
    seed = ray.data.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        .empty_table()
    )
    return seed.union(out)


def exact_substr_spans(
    docs: "ray.data.Dataset", k: int = 8, min_tokens: int | None = None
) -> "ray.data.Dataset":
    """ExactSubstr-style repeated-passage detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022,
    arXiv:2107.06499 §4.1), k-gram-anchored: a token position is
    "duplicated" iff the k-gram starting there occurs >= 2 times in the
    WHOLE corpus (across or within docs); maximal runs of consecutive
    duplicated positions are the repeated spans (every span the suffix
    array would find of length >= k is found, with start/end resolved to
    k-gram granularity — the published approximation that trades the
    non-distributable suffix array for two range shuffles).

    Output: (doc_id, start_pos, end_pos, span_tokens) — 1-based inclusive
    token positions per maximal span with span_tokens >= min_tokens
    (default k). All-integer, hash-exact vs the SQL twin.

    Scale shape (100-TB-first): docs explode in-task to (gram-hash, doc_id,
    pos) rows — the 64-bit gram hash is a vectorized polynomial combine of
    cached per-distinct-token md5 hashes (no gram string is ever
    materialized; the SQL twin hashes the gram string with md5 instead,
    which is equivalent because both hashes are collision-free at 64 bits
    w.p. 1-ε and the comparison is over the FINAL spans, not the hashes),
    and the text itself never shuffles; duplicated grams come from a
    two-phase grouped count (the shuffle carries one row per distinct gram
    per block); membership is a task-based sort-merge LEFT SEMI join
    (nothing broadcast — the dup set at crawl scale is itself huge); the
    gaps-and-islands pass is group_safe_map on doc_id, one vectorized
    numpy diff per block. Two tokenize passes over the corpus (count +
    join sides), the decontaminate_join trade: recompute beats pinning an
    exploded token stream in the object store."""
    from log_parser_ray.stages.aggregate import (
        group_safe_map,
        grouped_count,
        merge_join,
    )
    from log_parser_ray.stages.textops import _explode_terms

    min_tokens = k if min_tokens is None else min_tokens

    _POLY_BASE = np.uint64(1099511628211)  # FNV-1a prime as mixing base

    def occ_fn(t: pa.Table) -> pa.Table:
        flat, parent = _explode_terms(t)
        m = len(flat) - k + 1
        if m <= 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        mask = parent[:m] == parent[k - 1:]
        gp = parent[:m][mask]
        # token position of each gram start within its doc (1-based):
        # parent is nondecreasing, so the first flat index of each doc is
        # a searchsorted away
        firsts = np.searchsorted(parent, parent, side="left")
        pos = (np.arange(m, dtype=np.int64) - firsts[:m])[mask] + 1
        # 64-bit gram hash without materializing gram strings: md5 once per
        # DISTINCT token (worker-cached), then a vectorized polynomial
        # combine over the k-window (k numpy ops, wrapping mod 2^64)
        enc = flat.dictionary_encode()
        dict_h = _hash_tokens(enc.dictionary.to_pylist())
        th = dict_h[enc.indices.to_numpy(zero_copy_only=False)]
        acc = np.zeros(m, dtype=np.uint64)
        mult = np.uint64(1)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc += th[j : j + m] * mult
                mult = mult * _POLY_BASE
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gp]
        return pa.table(
            {
                "h": pa.array(acc[mask], pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    occ = docs.map_batches(occ_fn, batch_format="pyarrow", zero_copy_batch=True)

    counts = grouped_count(occ, ["h"], alias="cnt")
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], 2)).select(["h"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hits = merge_join(
        occ, dup, on="h", how="left_semi",
        left_schema=pa.schema(
            [("h", pa.uint64()), ("doc_id", pa.int64()), ("pos", pa.int64())]
        ),
        right_schema=pa.schema([("h", pa.uint64())]),
    )

    def spans(t: pa.Table) -> pa.Table:
        ix = pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("pos", "ascending")]
        )
        ids = t["doc_id"].take(ix).to_numpy(zero_copy_only=False)
        pos = t["pos"].take(ix).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start_pos": pa.array([], pa.int64()),
                    "end_pos": pa.array([], pa.int64()),
                    "span_tokens": pa.array([], pa.int64()),
                }
            )
        brk = np.flatnonzero((ids[1:] != ids[:-1]) | (pos[1:] != pos[:-1] + 1))
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk, [len(pos) - 1]])
        sp = pos[starts]
        ep = pos[ends] + k - 1
        keep = (ep - sp + 1) >= min_tokens
        return pa.table(
            {
                "doc_id": pa.array(ids[starts][keep], pa.int64()),
                "start_pos": pa.array(sp[keep], pa.int64()),
                "end_pos": pa.array(ep[keep], pa.int64()),
                "span_tokens": pa.array((ep - sp + 1)[keep], pa.int64()),
            }
        )

    return group_safe_map(hits, ["doc_id"], spans)


def exact_substr_dedup(
    docs: "ray.data.Dataset", k: int = 8, min_tokens: int | None = None
) -> "ray.data.Dataset":
    """ExactSubstr dedup proper (arXiv:2107.06499 §4.1): CUT the repeated
    spans found by `exact_substr_spans` out of every document (all copies —
    the paper's released dedup tool removes every occurrence of a
    duplicated substring; surviving context keeps the meaning once).

    Output: (doc_id, text_dedup, n_removed) for EVERY input doc —
    ``text_dedup`` is the document's lowercased token stream minus the
    covered positions, space-joined (the paper cuts raw bytes; this
    engine's RE2 tokenizer is offset-free, so the cut is at token
    granularity and the output is the normalized token text — documented,
    and what a train-ready corpus wants anyway), ``n_removed`` the count
    of removed tokens (0 for untouched docs).

    Scale shape: spans (tiny: one row per repeated run) union the docs
    stream tagged, then ONE group_safe_map on doc_id does the cut — per
    block it explodes the doc texts once, marks covered positions with a
    numpy prefix-sum interval trick (no per-span loop), and rebuilds the
    kept text with one Arrow ``binary_join`` over a ListArray. The corpus
    is tokenized three times total (spans' two passes + the cut) — the
    recompute-over-pinning trade again."""
    from log_parser_ray.stages.aggregate import group_safe_map
    from log_parser_ray.stages.textops import _explode_terms

    spans = exact_substr_spans(docs, k=k, min_tokens=min_tokens)

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "start_pos": pa.nulls(t.num_rows, pa.int64()),
                "end_pos": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_spans(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.nulls(t.num_rows, pa.string()),
                "start_pos": t["start_pos"],
                "end_pos": t["end_pos"],
            }
        )

    tagged = docs.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        spans.map_batches(
            tag_spans, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def cut(tbl: pa.Table) -> pa.Table:
        is_doc = pc.is_valid(tbl["text"])
        d = tbl.filter(is_doc)
        s = tbl.filter(pc.invert(is_doc))
        if d.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                    "n_removed": pa.array([], pa.int64()),
                }
            )
        flat, parent = _explode_terms(d)
        nf = len(flat)
        counts = np.bincount(parent, minlength=d.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        covered = np.zeros(nf, dtype=bool)
        if s.num_rows and nf:
            ids = d["doc_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            sid = s["doc_id"].to_numpy(zero_copy_only=False)
            row = order[np.searchsorted(ids[order], sid)]
            gs = offsets[row] + s["start_pos"].to_numpy(
                zero_copy_only=False
            ) - 1
            ge = offsets[row] + s["end_pos"].to_numpy(zero_copy_only=False)
            delta = np.zeros(nf + 1, dtype=np.int64)
            np.add.at(delta, gs, 1)
            np.add.at(delta, ge, -1)
            covered = np.cumsum(delta[:nf]) > 0
        keep = ~covered
        kept_flat = flat.filter(pa.array(keep))
        kept_counts = np.bincount(parent[keep], minlength=d.num_rows)
        koff = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(koff, pa.int32()), kept_flat)
        return pa.table(
            {
                "doc_id": d["doc_id"],
                "text_dedup": pc.binary_join(lst, " "),
                "n_removed": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    return group_safe_map(tagged, ["doc_id"], cut)
