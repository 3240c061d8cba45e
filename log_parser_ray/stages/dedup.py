"""Deduplication operators — exact and near-dup — over a document table.

Scale design (100 TB corpus):

* **exact**: md5 fingerprint per doc (map_batches) → groupby(fp) keeps the
  min-doc_id survivor. The shuffle moves ONE short hash row per doc, never
  the text. This is hash-partitioned dedup — the only all-to-all is on the
  16-byte key.
* **near-dup, the scale path = MinHash + LSH**: shingle → 64 minhash values
  (vectorized numpy) → 16 bands × 4 rows; each band's hash is a bucket key.
  The shuffle is groupby(bucket) over (bucket, doc_id) pairs — again no text
  movement. Candidate pairs come out of buckets; an exact-Jaccard verify pass
  keeps precision 1.0. Recall is governed by the banding S-curve
  (P[candidate] = 1-(1-j^rows)^bands).
* **near-dup, exact oracle-checkable variant**: inverted-index pairwise
  Jaccard (groupby(token) emits co-occurrence pairs). Exact but O(pairs);
  used for small/medium side paths and as the verification oracle for LSH.
  At web scale you'd add prefix filtering; LSH above is the intended route.
* **SimHash**: 64-bit fingerprint; candidates share one of 4 16-bit segments
  (Hamming ≤ 3 ⇒ pigeonhole: some segment is identical), verified by exact
  Hamming distance.

Reference analogue: the reference only has exact set-dedup via AWK assoc
arrays (SURVEY.md §2.7); the near-dup family is the training-data extension.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable

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

_word = re.compile(WORD_RE)


def token_set(text: str) -> set[str]:
    return set(_word.findall(text.lower()))


def _token_hash64(tokens: Iterable[str]) -> np.ndarray:
    """Stable 64-bit hashes of tokens (md5-derived, process-independent)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in tokens
        ],
        dtype=np.uint64,
    )


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


def _pairs_from_buckets(
    ds: "ray.data.Dataset",
    bucket_col: str,
    id_col: str,
    payload_col: str | None = None,
) -> "ray.data.Dataset":
    """(bucket, id[, payload]) → candidate pairs (a_id, b_id[, a_pl, b_pl]).

    Shape: ``sort(bucket)`` then ONE vectorized emission per block — equal
    buckets share a block after the range sort (same invariant as
    aggregate.sorted_combine), and group segmentation inside the block is
    numpy, so there is no per-group Python/pandas task overhead (the
    ``groupby().map_groups`` equivalent measured ~1 ms per bucket — ruinous
    at thousands of LSH buckets)."""

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
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "w": words})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def jaccard_pairs(
    docs: "ray.data.Dataset", threshold: float = 0.95
) -> pd.DataFrame:
    """All pairs (a_id < b_id) with token-set Jaccard ≥ threshold — exact.

    groupby(token) → co-occurrence pairs → count = |A∩B|; per-doc set sizes
    are a small side table broadcast into the final jaccard computation.
    Returns a pandas DataFrame (pair results are small relative to input)."""
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


def _bitsets(token_sets: dict[int, set[str]]):
    """doc_id → row of a packed token-bitset matrix (vocab-indexed bits).

    Lets pair verification run as vectorized AND/OR + popcount over uint64
    words instead of Python set ops — 10⁶+ candidate pairs/second."""
    vocab: dict[str, int] = {}
    for s in token_sets.values():
        for w in s:
            vocab.setdefault(w, len(vocab))
    width = max(1, (len(vocab) + 63) // 64)
    ids = np.fromiter(token_sets.keys(), dtype=np.int64, count=len(token_sets))
    m = np.zeros((len(ids), width), dtype=np.uint64)
    for r, s in enumerate(token_sets.values()):
        for w in s:
            j = vocab[w]
            m[r, j >> 6] |= np.uint64(1 << (j & 63))
    row_of = {int(d): r for r, d in enumerate(ids)}
    return m, row_of


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Row-wise popcount of a (n, width) uint64 matrix → (n,) int64."""
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1).astype(np.int64)


def exact_jaccard_of_pairs(
    pairs: pd.DataFrame, token_sets: dict[int, set[str]], chunk: int = 1 << 20
) -> pd.DataFrame:
    """Exact Jaccard for candidate pairs (the LSH verify step) — vectorized
    bitset intersection/union, chunked to bound memory."""
    if len(pairs) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "i", "u", "jac"])
    m, row_of = _bitsets(token_sets)
    a = pairs["a_id"].map(row_of).to_numpy(dtype=np.int64)
    b = pairs["b_id"].map(row_of).to_numpy(dtype=np.int64)
    outs = []
    for s in range(0, len(a), chunk):
        ai, bi = a[s : s + chunk], b[s : s + chunk]
        inter = _popcount_rows(m[ai] & m[bi])
        union = _popcount_rows(m[ai] | m[bi])
        union = np.maximum(union, 1)
        outs.append(
            pd.DataFrame(
                {
                    "a_id": pairs["a_id"].to_numpy()[s : s + chunk],
                    "b_id": pairs["b_id"].to_numpy()[s : s + chunk],
                    "i": inter,
                    "u": union,
                    "jac": np.round(inter / union, 6),
                }
            )
        )
    return pd.concat(outs, ignore_index=True)


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    docs: "ray.data.Dataset", n_perm: int = N_PERM, batch_size: int = 4096
):
    """(doc_id, sig: fixed_size_list<uint64>[n_perm]) — vectorized per batch."""
    a, b = _perm_params(n_perm)

    def fn(t: pa.Table) -> pa.Table:
        sigs = np.empty((t.num_rows, n_perm), dtype=np.uint64)
        for i, s in enumerate(t["text"].to_pylist()):
            toks = token_set(s)
            if not toks:
                sigs[i, :] = np.uint64(MERSENNE_P)
                continue
            h = _token_hash64(toks) % np.uint64(MERSENNE_P)
            # (a*h + b) mod p for all perms × tokens at once
            vals = (h[None, :] * a[:, None] + b[:, None]) % np.uint64(MERSENNE_P)
            sigs[i, :] = vals.min(axis=1)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), n_perm
        )
        return pa.table({"doc_id": t["doc_id"], "sig": sig_arr})

    return docs.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def lsh_buckets(signatures: "ray.data.Dataset", bands: int = LSH_BANDS):
    """Explode signatures to (bucket, doc_id) — bucket = band idx + band hash."""

    def fn(t: pa.Table) -> pa.Table:
        sigs = np.asarray(t["sig"].combine_chunks().flatten()).reshape(
            t.num_rows, -1
        )
        rows_per_band = sigs.shape[1] // bands
        ids = t["doc_id"].to_numpy()
        out_b, out_d = [], []
        for band in range(bands):
            seg = sigs[:, band * rows_per_band : (band + 1) * rows_per_band]
            for i in range(len(ids)):
                h = hashlib.md5(seg[i].tobytes()).hexdigest()[:16]
                out_b.append(f"{band}:{h}")
                out_d.append(ids[i])
        return pa.table(
            {"bucket": pa.array(out_b), "doc_id": pa.array(out_d, pa.int64())}
        )

    return signatures.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def minhash_near_dups(
    docs: "ray.data.Dataset", threshold: float = 0.9
) -> pd.DataFrame:
    """MinHash-LSH candidate pairs, verified by exact Jaccard ≥ threshold.

    Pipeline: signatures (map_batches) → band buckets (map_batches) →
    groupby(bucket) pair emission → distinct pairs → exact verify.
    Precision is 1.0 by construction; recall follows the banding S-curve.

    The verify step needs the two token sets per pair. Here the per-doc
    token-set table is collected driver-side and used as a broadcast dict —
    valid while distinct-token lists fit in memory (they are ~vocab-bounded);
    the at-scale variant replaces it with a hash join of `pairs` against
    `tokenize_distinct` on each side (two shuffles on doc_id)."""
    from log_parser_ray.stages.aggregate import grouped_count

    sigs = minhash_signatures(docs)
    buckets = lsh_buckets(sigs)

    cand = _pairs_from_buckets(buckets, "bucket", "doc_id")
    cand = grouped_count(cand, ["a_id", "b_id"], alias="_nb").to_pandas()
    if len(cand) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "i", "u", "jac"])

    token_sets = {
        d: token_set(s)
        for d, s in zip(
            *[
                docs.select_columns(["doc_id", "text"]).to_pandas()[c]
                for c in ("doc_id", "text")
            ]
        )
    }
    verified = exact_jaccard_of_pairs(cand[["a_id", "b_id"]], token_sets)
    out = verified[verified["jac"] >= threshold].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True)


def minhash_clusters(
    docs: "ray.data.Dataset", threshold: float = 0.9
) -> pd.DataFrame:
    """Scalable MinHash-LSH dedup: near-dup CLUSTERS, not all pairs.

    A dense near-dup corpus makes the pairwise output inherently quadratic
    (n near-identical docs ⇒ n²/2 pairs). The production dedup shape avoids
    it: per LSH bucket emit only EDGES to the bucket's minimum doc_id
    (O(bucket size), never O(size²)), verify each edge's exact Jaccard, then
    take connected components by iterated min-label propagation. Output:
    (doc_id, cluster_id=min doc in component, cluster_size). Docs sharing a
    cluster are transitively ≥threshold-similar — standard
    MinHash-dedup-cluster semantics (e.g. the SlimPajama/RefinedWeb recipe).

    The label propagation runs on the edge table (O(docs × bands) rows); at
    corpus scale each iteration is a groupby-min — here it is pandas on the
    driver, with the same fixpoint logic."""
    sigs = minhash_signatures(docs)
    buckets = lsh_buckets(sigs)

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
            a_all.append(ids[s + 1 : e])
            b_all.append(np.full(e - s - 1, mn, dtype=np.int64))
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

    from log_parser_ray.stages.aggregate import group_safe_map

    raw_edges = (
        group_safe_map(buckets, ["bucket"], edges_fn)
        .to_pandas()
        .drop_duplicates()
    )

    docs_pd = docs.select_columns(["doc_id", "text"]).to_pandas()
    token_sets = {
        int(d): token_set(s) for d, s in zip(docs_pd["doc_id"], docs_pd["text"])
    }
    if len(raw_edges):
        verified = exact_jaccard_of_pairs(raw_edges, token_sets)
        edges = verified[verified["jac"] >= threshold][["a_id", "b_id"]]
    else:
        edges = raw_edges

    # connected components: iterate label = min(label, neighbors' labels)
    label = {int(d): int(d) for d in docs_pd["doc_id"]}
    if len(edges):
        adj = pd.concat(
            [edges, edges.rename(columns={"a_id": "b_id", "b_id": "a_id"})]
        )
        for _ in range(64):  # d log d bound; tiny in practice
            mapped = adj["b_id"].map(label)
            new = adj.assign(lbl=mapped).groupby("a_id")["lbl"].min()
            changed = False
            for d, l in new.items():
                if l < label[int(d)]:
                    label[int(d)] = int(l)
                    changed = True
            if not changed:
                break
            # path-compress via label chasing
            for d in label:
                while label[d] != label[label[d]]:
                    label[d] = label[label[d]]
    out = pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster_id": list(label.values())}
    )
    sizes = out.groupby("cluster_id")["doc_id"].transform("count")
    out["cluster_size"] = sizes.astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


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
    from log_parser_ray.stages.aggregate import grouped_count
    from log_parser_ray.stages.textops import simhash64

    n_seg = max_hamming + 1
    seg_bits = 64 // n_seg

    fps = simhash64(docs.select_columns(["doc_id", "text"])).select_columns(
        ["doc_id", "simhash"]
    )

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hs = [int(x, 16) for x in t["simhash"].to_pylist()]
        ob, od, oh = [], [], []
        for d, h in zip(ids, hs):
            for s in range(n_seg):
                seg = (h >> (s * seg_bits)) & ((1 << seg_bits) - 1)
                ob.append(f"{s}:{seg:x}")
                od.append(d)
                oh.append(h)
        return pa.table(
            {
                "bucket": pa.array(ob),
                "doc_id": pa.array(od, pa.int64()),
                "h": pa.array(oh, pa.uint64()),
            }
        )

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
