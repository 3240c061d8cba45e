"""Text embedding stage — actor pool, batched inference shape.

``HashEmbedder`` implements the feature-hashing trick (token → stable hash →
bucket ± sign, L2-normalized): a real, deterministic, dependency-free text
embedding, AND the stand-in for a model embedder — a sentence-transformer
would load in ``__init__`` (once per actor) and replace ``__call__``'s
arithmetic with a batched forward pass; the Ray plumbing (actor pool,
batch sizing, fixed-size-list output) is identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

EMBED_DIM = 64


class HashEmbedder:
    def __init__(self, dim: int = EMBED_DIM):
        # Worker-side: silence Ray's benign schema-dedup warning (input
        # blocks carry unhashable parquet pandas-metadata; see package
        # __init__). Actor __init__ runs after the worker's logging setup,
        # so this pin sticks where the import-time one can be overridden.
        import logging

        logging.getLogger(
            "ray.data._internal.arrow_ops.transform_pyarrow"
        ).setLevel(logging.ERROR)
        self.dim = dim
        self._cache: dict[str, tuple[int, int]] = {}  # token → (bucket, sign)

    def _slot(self, tok: str) -> tuple[int, int]:
        v = self._cache.get(tok)
        if v is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            v = (h % self.dim, 1 if (h >> 63) else -1)
            self._cache[tok] = v
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        # vectorized: one explode per batch, md5 once per DISTINCT token
        # (np.unique + the actor cache), then one grouped scatter-add —
        # the same shape a batched model forward pass would replace
        from log_parser_ray.stages.textops import _explode_terms

        out = np.zeros((t.num_rows, self.dim), dtype=np.float32)
        flat, parent = _explode_terms(t)
        if len(flat):
            toks = flat.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(toks, return_inverse=True)
            slots = np.array([self._slot(u) for u in uniq], dtype=np.int64)
            np.add.at(out, (parent, slots[inv, 0]), slots[inv, 1])
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        out /= norms
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), type=pa.float32()), self.dim
        )
        return pa.table({"doc_id": t["doc_id"], "embedding": emb})


def embed_documents(
    docs: "ray.data.Dataset", *, dim: int = EMBED_DIM, concurrency: int = 2,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """(doc_id, text) → (doc_id, embedding) via the embedder actor pool."""
    return docs.map_batches(
        HashEmbedder,
        fn_constructor_kwargs={"dim": dim},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def hash_features(
    docs: "ray.data.Dataset", *, dim: int = EMBED_DIM
) -> "ray.data.Dataset":
    """The embedder's integer core as an oracle-checkable table: per doc the
    NONZERO feature-hash buckets and their signed occurrence sums — exactly
    the vector ``HashEmbedder.__call__`` L2-normalizes (same md5 slot rule:
    bucket = h % dim, sign = +1 iff the top bit of the little-endian 64-bit
    prefix is set). Distributed map over batches; no shuffle — each doc's
    tokens stay inside its row."""
    from log_parser_ray.stages.textops import _explode_terms

    embedder = HashEmbedder(dim=dim)

    def fn(t: pa.Table) -> pa.Table:
        counts = np.zeros((t.num_rows, dim), dtype=np.int64)
        flat, parent = _explode_terms(t)
        if len(flat):
            toks = flat.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(toks, return_inverse=True)
            slots = np.array(
                [embedder._slot(u) for u in uniq], dtype=np.int64
            )
            np.add.at(counts, (parent, slots[inv, 0]), slots[inv, 1])
        rows, buckets = np.nonzero(counts)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(rows)),
                "bucket": pa.array(buckets.astype(np.int64)),
                "val": pa.array(counts[rows, buckets]),
            }
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
