"""Similarity search over an embedding column (list<float>).

Scale design: the query matrix is small and broadcast (ray.put once via
closure capture — Ray serializes it into the task/actor definition a single
time, not per batch); the corpus streams through ``map_batches`` in blocks.
Each block computes a float64 matmul against the broadcast queries and emits
only its LOCAL top-k rows per query, so the shuffle/driver traffic is
O(k × num_blocks), never the corpus. The IVF variant prunes the matmul to
vectors whose coarse centroid is among the query's nprobe nearest — the
classic inverted-file ANN layout; at cluster scale the assignment becomes the
partitioning key so each probe touches only matching partitions.

All cosine math is float64 (inputs are float32, exactly widened) so results
are bit-comparable with the DuckDB oracle's
list_cosine_similarity(CAST(… AS DOUBLE[])).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float32> column → (n, d) float64 matrix, zero-copy until widen."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def load_queries(sf_dir: str, n_queries: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the embeddings with vec_id < n_queries."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pa.compute.less(t["vec_id"], n_queries)).sort_by("vec_id")
    return t["vec_id"].to_numpy(), _to_matrix(t["embedding"])


def knn_bruteforce(
    emb: "ray.data.Dataset",
    query_ids: np.ndarray,
    queries: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k per query: blocked matmul + local top-k + final merge.

    Returns (query_id, vec_id, sim) with sim rounded to 6dp for the report
    edge; ranking happens on unrounded float64."""
    qn = _normalize(queries)

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(_to_matrix(t["embedding"]))
        sims = m @ qn.T  # (n, q)
        out_q, out_v, out_s = [], [], []
        for j in range(qn.shape[0]):
            s = sims[:, j]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != query_ids[j]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            # local top-k: a row outside its block's top-k cannot be global
            # top-k; ties at the boundary break by vec_id ASC (the global
            # tiebreak), else a dropped tied row could be the global pick
            top = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
            out_q.extend([query_ids[j]] * len(top))
            out_v.extend(ids[top])
            out_s.extend(s[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cand = emb.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = cand.to_pandas()  # ≤ k × num_blocks × n_queries rows — small
    df = df.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["sim"] = df["sim"].round(6)
    return df.reset_index(drop=True)


def kmeans_fit(
    m: np.ndarray, n_clusters: int = 10, n_iter: int = 8, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd's k-means (seeded init) — the IVF coarse quantizer.

    At corpus scale this runs on a uniform sample (a few 100k vectors is
    plenty for a coarse quantizer); assignment of the full corpus is a
    map_batches pass."""
    rs = np.random.RandomState(seed)
    centroids = m[rs.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    m_sq = (m * m).sum(axis=1, keepdims=True)  # |x|² reused every iteration
    for _ in range(n_iter):
        # argmin ‖x−c‖² = argmin (|c|² − 2 x·c): one (n,k) matmul instead of
        # the (n,k,d) broadcast temporary
        d = m_sq + (centroids * centroids).sum(axis=1)[None, :] - 2.0 * (m @ centroids.T)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            pts = m[assign == c]
            if len(pts):
                centroids[c] = pts.mean(axis=0)
    return centroids


def kmeans_fit_sampled(
    emb: "ray.data.Dataset",
    n_clusters: int = 10,
    sample_target: int = 20_000,
    n_iter: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Coarse-quantizer fit from a BOUNDED deterministic sample of the
    embedding Dataset — the at-scale fit path: only ~sample_target vectors
    ever reach the driver, regardless of corpus size. The sample is the
    engine-exact md5-bucket filter (sketch.sample_by_hash), so the fitted
    centroids are reproducible across runs and cluster sizes; Lloyd's then
    runs locally on the sample (a coarse quantizer needs only a sketch of
    the density, not the corpus)."""
    from log_parser_ray.stages.sketch import sample_by_hash

    n = emb.count()  # parquet metadata, not a scan
    if n > sample_target:
        frac = sample_target / n
        keep = max(1, min(65536, round(frac * 65536)))
        emb = sample_by_hash(emb, id_col, keep_buckets=keep)
    parts, id_parts = [], []
    for b in emb.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        parts.append(_to_matrix(t["embedding"]))
        id_parts.append(t[id_col].to_numpy(zero_copy_only=False))
    m = np.concatenate(parts, axis=0)
    # batches arrive in COMPLETION order (streaming executor) — re-order the
    # bounded sample by id so the seeded init is block-layout invariant, as
    # the docstring promises
    m = m[np.argsort(np.concatenate(id_parts), kind="stable")]
    return kmeans_fit(m, n_clusters=n_clusters, n_iter=n_iter, seed=seed)


def knn_ivf(
    emb: "ray.data.Dataset",
    query_ids: np.ndarray,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 3,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF-style ANN: probe the nprobe clusters nearest each query; exact
    cosine within probed clusters only. Same output shape as brute force."""
    qn = _normalize(queries)
    cn = _normalize(centroids)
    # per query: the set of probed cluster ids
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(_to_matrix(t["embedding"]))
        assign = (m @ cn.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for j in range(qn.shape[0]):
            mask = np.isin(assign, probes[j])
            if exclude_self:
                mask &= ids != query_ids[j]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            s = m[cand] @ qn[j]
            top = np.lexsort((ids[cand], -s))[:k]
            out_q.extend([query_ids[j]] * len(top))
            out_v.extend(ids[cand[top]])
            out_s.extend(s[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cand = emb.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = cand.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k)
    df["sim"] = df["sim"].round(6)
    return df.reset_index(drop=True)


def ivf_index_write(
    emb: "ray.data.Dataset", centroids: np.ndarray, path: str
) -> None:
    """Materialize the IVF layout: assign every vector to its nearest coarse
    centroid and write centroid-PARTITIONED Parquet (path/cent=<c>/…).

    This is the partition-by-centroid scale path the in-memory knn_ivf only
    simulates: at 100 TB the assignment is the partitioning key, so a probe
    touches only its partitions' bytes — the read below prunes whole hive
    directories via the partition filter, never scanning unprobed cells."""
    cn = _normalize(centroids)

    def assign(t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t["embedding"]))
        cent = (m @ cn.T).argmax(axis=1).astype(np.int32)
        return t.append_column("cent", pa.array(cent, pa.int32()))

    emb.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        path, partition_cols=["cent"]
    )


def knn_ivf_indexed(
    path: str,
    query_ids: np.ndarray,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 3,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """ANN over a centroid-partitioned index: read ONLY the probed
    partitions' directories (unprobed cells contribute zero bytes), exact
    cosine within them. Output shape = knn_bruteforce."""
    import os

    qn = _normalize(queries)
    cn = _normalize(centroids)
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
    probed_cents = sorted({int(c) for row in probes for c in row})

    # directory-level pruning: each cent=<c> hive dir is one IVF cell
    parts = []
    for c in probed_cents:
        d = os.path.join(path, f"cent={c}")
        if not os.path.isdir(d):
            continue
        cell = ray.data.read_parquet(d)

        def with_cent(t: pa.Table, cc=c) -> pa.Table:
            col = pa.array(np.full(t.num_rows, cc, np.int32))
            if "cent" in t.column_names:  # hive key inferred by the reader
                return t.set_column(t.schema.get_field_index("cent"), "cent", col)
            return t.append_column("cent", col)

        parts.append(
            cell.map_batches(with_cent, batch_format="pyarrow", zero_copy_batch=True)
        )
    emb = parts[0]
    for p in parts[1:]:
        emb = emb.union(p)

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        cents = t["cent"].to_numpy()
        m = _normalize(_to_matrix(t["embedding"]))
        out_q, out_v, out_s = [], [], []
        for j in range(qn.shape[0]):
            mask = np.isin(cents, probes[j])
            if exclude_self:
                mask &= ids != query_ids[j]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            s = m[cand] @ qn[j]
            top = np.lexsort((ids[cand], -s))[:k]
            out_q.extend([query_ids[j]] * len(top))
            out_v.extend(ids[cand[top]])
            out_s.extend(s[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cand = emb.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = cand.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k)
    df["sim"] = df["sim"].round(6)
    return df.reset_index(drop=True)


def cosine_near_dup_pairs(
    emb: "ray.data.Dataset", full_matrix_ids: np.ndarray, full_matrix: np.ndarray,
    threshold: float = 0.4,
) -> pd.DataFrame:
    """All pairs (a<b) with cosine ≥ threshold: blocked row-stripe × broadcast.

    The right side is broadcast once; each block computes its stripe of the
    similarity matrix and keeps only above-threshold upper-triangle entries.
    At corpus scale the broadcast side is replaced by LSH / IVF bucketing
    (see knn_ivf) — this is the exact small/medium path and the verifier."""
    fn_ids = full_matrix_ids
    fm = _normalize(full_matrix)

    def stripe(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(_to_matrix(t["embedding"]))
        sims = m @ fm.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = ids[ai] < fn_ids[bi]  # upper triangle only, dedupes symmetric hits
        return pa.table(
            {
                "a_id": pa.array(ids[ai][keep], pa.int64()),
                "b_id": pa.array(fn_ids[bi][keep], pa.int64()),
                "sim": pa.array(np.round(sims[ai, bi][keep], 6), pa.float64()),
            }
        )

    df = (
        emb.map_batches(stripe, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
    )
    return df.reset_index(drop=True)


def cosine_near_dup_pairs_bucketed(
    emb: "ray.data.Dataset",
    centroids: np.ndarray,
    threshold: float = 0.4,
    n_assign: int = 2,
) -> pd.DataFrame:
    """Embedding near-dup pairs WITHOUT the broadcast matrix — the scale
    path. Each vector is assigned to its ``n_assign`` nearest coarse
    centroids (multi-assignment recovers most near-boundary pairs); the
    shuffle is groupby(cell) over (cell, vec_id, vec-bytes) rows, candidate
    pairs are emitted per cell, and exact cosine verifies each pair —
    precision 1.0, recall bounded by co-assignment (two vectors with
    cosine ≥ threshold that share no cell are missed; raise n_assign or
    centroid count to trade recall vs cell size). Same bucket-join shape as
    MinHash LSH — nothing is broadcast, nothing is O(n²)."""
    from log_parser_ray.stages.dedup import _pairs_from_buckets

    cn = _normalize(centroids)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(_to_matrix(t["embedding"]))
        sims = m @ cn.T
        top = np.argsort(-sims, axis=1)[:, :n_assign]
        n = len(ids)
        cells = top.reshape(-1).astype(np.int64)
        out_ids = np.repeat(ids, n_assign)
        payload = [m[i].astype(np.float64).tobytes() for i in range(n) for _ in range(n_assign)]
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "vec_id": pa.array(out_ids, pa.int64()),
                "vec": pa.array(payload, pa.binary()),
            }
        )

    exploded = emb.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    pairs = _pairs_from_buckets(exploded, "cell", "vec_id", payload_col="vec")

    def verify(t: pa.Table) -> pa.Table:
        a = t["a_pl"].to_pylist()
        b = t["b_pl"].to_pylist()
        sims = np.fromiter(
            (float(np.frombuffer(x, np.float64) @ np.frombuffer(y, np.float64))
             for x, y in zip(a, b)),
            np.float64, len(a),
        )
        keep = sims >= threshold
        return pa.table(
            {
                "a_id": pa.array(t["a_id"].to_numpy()[keep], pa.int64()),
                "b_id": pa.array(t["b_id"].to_numpy()[keep], pa.int64()),
                "sim": pa.array(np.round(sims[keep], 6), pa.float64()),
            }
        )

    verified = pairs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
    from log_parser_ray.stages.aggregate import sorted_combine

    # a pair co-assigned to several cells appears once per shared cell
    dedup = sorted_combine(
        verified, ["a_id", "b_id"], [("sim", "min")],
        renames={"sim_min": "sim"}, keep=["a_id", "b_id", "sim"],
    ).to_pandas()
    return dedup.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def load_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Full (ids, matrix) of the embeddings table — the small broadcast side."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t["vec_id"].to_numpy(), _to_matrix(t["embedding"])


def semantic_dedup(
    emb: "ray.data.Dataset",
    n_clusters: int = 8,
    threshold: float = 0.4,
    sample_target: int = 20_000,
    n_iter: int = 8,
    seed: int = 42,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540): k-means-cluster the
    embeddings with the sampled coarse quantizer, then WITHIN each cluster
    drop every vector that has a smaller-id neighbor at cosine >=
    threshold. Survivor choice is deterministic min-vec_id (the anti-join
    variant of the paper's greedy keep-one rule — same idiom as
    dedup.exact_dedup), so the result is independent of block layout and
    parallelism. Output: (vec_id, cluster, kept).

    Scale shape: the quantizer fit touches only a bounded md5-bucket sample
    (kmeans_fit_sampled); assignment is one matmul map over the stream; the
    only shuffle is groupby(cluster) over (cluster, vec_id, unit-vec bytes)
    rows; the per-cluster O(c^2) similarity matrix is the SemDeDup design
    itself — n_clusters grows with the corpus precisely so each cluster
    stays bounded (the paper uses ~100k clusters for LAION-scale).

    ``n_clusters=1`` is the exactness regime: a single cluster makes the
    prune identical to a GLOBAL cosine near-dup anti-join, which has a
    brute-force SQL twin (the knn_ivf_exhaustive pattern) — that regime is
    the oracle entry; the clustered path is pinned by tests against an
    in-process brute force.
    """
    centroids = (
        kmeans_fit_sampled(
            emb, n_clusters=n_clusters, sample_target=sample_target,
            n_iter=n_iter, seed=seed,
        )
        if n_clusters > 1
        else None
    )

    def assign(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = _to_matrix(t["embedding"])
        if centroids is None:
            cells = np.zeros(len(ids), dtype=np.int64)
        else:
            # Euclidean argmin, the same expansion kmeans_fit assigns with
            m_sq = (m * m).sum(axis=1, keepdims=True)
            d = (
                m_sq
                + (centroids * centroids).sum(axis=1)[None, :]
                - 2.0 * (m @ centroids.T)
            )
            cells = d.argmin(axis=1).astype(np.int64)
        u = _normalize(m)
        payload = [u[i].tobytes() for i in range(len(ids))]
        return pa.table(
            {
                "cluster": pa.array(cells, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "vec": pa.array(payload, pa.binary()),
            }
        )

    rows = emb.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def prune(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "kept": pa.array([], pa.bool_()),
                }
            )
        cl = b["cluster"].to_numpy(zero_copy_only=False)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        raw = b["vec"].to_pylist()
        order = np.lexsort((ids, cl))
        cl, ids = cl[order], ids[order]
        vecs = np.vstack([np.frombuffer(raw[i], np.float64) for i in order])
        kept = np.ones(n, dtype=bool)
        starts = np.flatnonzero(np.concatenate(([True], cl[1:] != cl[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        for s, e in zip(starts, ends):
            c = e - s
            if c < 2:
                continue
            m = vecs[s:e]
            sims = m @ m.T
            # ids[s:e] ascend (lexsort) — "smaller-id neighbor" = strict
            # lower triangle
            hit = sims >= threshold
            hit &= np.tril(np.ones((c, c), dtype=bool), -1)
            kept[s:e] = ~hit.any(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "kept": pa.array(kept),
            }
        )

    from log_parser_ray.stages.aggregate import group_safe_map

    return group_safe_map(rows, ["cluster"], prune)


# ---------------------------------------------------------------------------
# SRP-LSH (random-hyperplane) bucketed ANN — the LSH scale path next to IVF


def srp_planes(
    dim: int, n_bits: int, n_tables: int, seed: int = 42
) -> list[np.ndarray]:
    """n_tables independent (dim, n_bits) Gaussian hyperplane sets, seeded."""
    rs = np.random.RandomState(seed)
    return [rs.standard_normal((dim, n_bits)) for _ in range(n_tables)]


def srp_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Signed-random-projection bucket code per row: sign bits of the
    projections packed into one uint64 (Charikar 2002 §3; P[bit match] =
    1 - angle/pi, so near-duplicate vectors collide in whole codes)."""
    bits = (m @ planes) >= 0.0
    w = np.uint64(1) << np.arange(planes.shape[1], dtype=np.uint64)
    return (bits.astype(np.uint64) * w).sum(axis=1, dtype=np.uint64)


def knn_srp(
    emb: "ray.data.Dataset",
    query_ids: np.ndarray,
    queries: np.ndarray,
    k: int = 5,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """LSH-bucketed approximate kNN: a vector is a candidate for a query
    iff they share a bucket code in ANY of ``n_tables`` SRP tables; only
    candidates get the exact cosine re-rank. ``n_bits=0`` degenerates to
    one global bucket — exact brute force (pinned against knn_bruteforce
    in tests). Recall rises with n_tables and falls with n_bits; the
    (12, 4) default targets high-sim neighbors (the near-dup regime).

    Scale shape: the planes and the per-table query codes are broadcast
    (a few KB); each block computes its rows' codes with one matmul per
    table and re-ranks ONLY bucket-matched rows, so at crawl scale the
    per-block cost is the code matmuls plus a candidate-sized matmul
    instead of the full block × query product; ≤ k·blocks·queries rows
    reach the driver merge (same as knn_bruteforce)."""
    qn = _normalize(queries)
    planes = srp_planes(qn.shape[1], n_bits, n_tables, seed) if n_bits else []
    qcodes = [srp_codes(qn, p) for p in planes]

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(_to_matrix(t["embedding"]))
        codes = [srp_codes(m, p) for p in planes]
        out_q, out_v, out_s = [], [], []
        for j in range(qn.shape[0]):
            if planes:
                mask = np.zeros(len(ids), dtype=bool)
                for c, qc in zip(codes, qcodes):
                    mask |= c == qc[j]
            else:
                mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != query_ids[j]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            s = m[cand] @ qn[j]
            top = np.lexsort((ids[cand], -s))[:k]
            out_q.extend([query_ids[j]] * len(top))
            out_v.extend(ids[cand][top])
            out_s.extend(s[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cand = emb.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    df = cand.to_pandas()
    if "query_id" not in df.columns:
        # zero candidates anywhere (no bucket matched any query) leaves only
        # Ray's column-less empty blocks — a REAL path at high n_bits, not
        # just the empty-input edge
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
    df = df.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["sim"] = df["sim"].round(6)
    return df.reset_index(drop=True)
