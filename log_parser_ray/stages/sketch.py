"""Sampling, fingerprinting and frequency-sketch operators.

Three operators a 100 TB training-data pipeline needs that neither the
reference nor the rest of this repo covered:

- ``winnow_fingerprints`` — document fingerprinting by k-gram ROLLING
  polynomial hash + winnowing window selection (Schleimer, Wilkerson &
  Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
  SIGMOD 2003): the content-overlap / plagiarism-detection fingerprint that
  md5-of-whole-text (textops.fingerprint) cannot provide. Reference
  analogue: the per-line scalar derivations of SURVEY.md §2.2, applied as a
  sliding function over characters instead of one regex per line.

- ``sample_by_hash`` / ``stratified_sample`` — DETERMINISTIC hash-bucket
  sampling: keep a row iff a stable hash of its key lands under a
  threshold. Unlike random sampling this is reproducible across runs,
  cluster sizes and engines (the DuckDB oracle computes the identical md5
  bucket), composable (same salt → same subset; disjoint salts → disjoint
  subsets) and exactly resumable — the properties corpus-subset selection
  at scale actually needs.

- ``heavy_hitters`` — exact top-k most-frequent values via a Misra–Gries
  summary (Misra & Gries 1982) with a certified exactness check: the
  sketch pass bounds every uncounted item's frequency; when the bound
  proves the top-k is complete the full shuffle is skipped, otherwise the
  operator falls back to the exact grouped count. Either way the OUTPUT is
  exact — the sketch only changes how much data moves.

All outputs are integers/strings, so every operator here is value-exact
against its SQL oracle.
"""

from __future__ import annotations

import hashlib
import re
from typing import Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# ---------------------------------------------------------------------------
# winnowing fingerprints

# Rolling-hash parameters. P is a Mersenne prime small enough that a k-gram's
# SUM(code * B^j) stays below 2^42 (codes < 128, B^j < P < 2^31, k ≤ 32) —
# exact in int64 on the numpy side AND in BIGINT on the DuckDB side, no
# HUGEINT needed.
WINNOW_P = (1 << 31) - 1
WINNOW_B = 131
WINNOW_K = 8  # k-gram length (characters, after normalization)
WINNOW_W = 4  # winnowing window (consecutive k-gram hashes)

_NON_ALNUM = re.compile(r"[^a-z0-9]")


def _bpow(k: int) -> np.ndarray:
    """[B^(k-1), ..., B, 1] mod P as int64."""
    out = np.empty(k, dtype=np.int64)
    v = 1
    for j in range(k - 1, -1, -1):
        out[j] = v
        v = (v * WINNOW_B) % WINNOW_P
    return out


def winnow_fingerprints(
    docs: "ray.data.Dataset", k: int = WINNOW_K, w: int = WINNOW_W
) -> "ray.data.Dataset":
    """(doc_id, text) → (doc_id, pos, fp): the winnowed k-gram fingerprints.

    Per document: lowercase, strip non-alphanumerics, hash every k-gram with
    a polynomial rolling hash (computed here as one vectorized
    windows@powers matmul mod P — numerically identical to the sequential
    rolling recurrence, and exact in int64), then slide a window of ``w``
    consecutive hashes and record the RIGHTMOST minimum of each window
    (the winnowing selection rule; rightmost tie-break). Documents shorter
    than one full window keep the minimum of what they have, so every
    non-empty document yields at least one fingerprint (guarantee from the
    paper: any match of length ≥ w+k-1 shares a fingerprint).

    Scale shape: embarrassingly parallel map_batches — each document's
    fingerprints derive from its own text only; output is ~n_grams/w rows
    per doc. Downstream near-dup joins group by ``fp`` exactly like the
    MinHash bucket pipeline (dedup.py)."""
    bp = _bpow(k)

    def fn(t: pa.Table) -> pa.Table:
        out_doc, out_pos, out_fp = [], [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            norm = _NON_ALNUM.sub("", (s or "").lower())
            codes = np.frombuffer(norm.encode("ascii"), dtype=np.uint8).astype(np.int64)
            if len(codes) < k:
                continue
            grams = np.lib.stride_tricks.sliding_window_view(codes, k)
            h = (grams @ bp) % WINNOW_P
            t_n = len(h)
            if t_n < w:
                sel = np.array([t_n - 1 - int(np.argmin(h[::-1]))])
            else:
                hw = np.lib.stride_tricks.sliding_window_view(h, w)
                # rightmost min: first min of the reversed window
                idx = (w - 1) - np.argmin(hw[:, ::-1], axis=1)
                sel = np.unique(np.arange(len(hw)) + idx)
            out_doc.extend([doc_id] * len(sel))
            out_pos.extend(sel.tolist())
            out_fp.extend(h[sel].tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "pos": pa.array(out_pos, type=pa.int64()),
                "fp": pa.array(out_fp, type=pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def winnow_oracle_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """DuckDB twin of ``winnow_fingerprints`` over the documents view.

    Same normalization regex, same polynomial (per-position power VALUES
    table; sum-then-mod matches the numpy matmul-then-mod), same window
    rule expressed relationally: for each window end j, take the MAX
    position among rows achieving the window MIN (= rightmost minimum);
    short documents get the single clamped window via least(w, t)-1."""
    bp = _bpow(k)
    pow_rows = ", ".join(f"({j}, {int(bp[j])})" for j in range(k))
    return f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents),
pos AS (
  -- list-valued range() (scalar fn, unlike the table fn it accepts column
  -- parameters) + unnest gives exactly len(s)-k+1 positions per doc —
  -- covers any doc length, no silent cap
  SELECT doc_id, s, unnest(range(0, len(s) - {k} + 1)) AS i FROM norm),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(s, CAST(i + 1 AS INTEGER), {k}) AS g
  FROM pos),
powv(j, p) AS (SELECT j, CAST(p AS BIGINT) FROM (VALUES {pow_rows}) v(j, p)),
hashed AS (
  SELECT doc_id, i,
         CAST(SUM(CAST(ascii(substr(g, CAST(j + 1 AS INTEGER), 1)) AS BIGINT) * p) % {WINNOW_P} AS BIGINT) AS h
  FROM grams JOIN powv ON TRUE
  GROUP BY doc_id, i),
cnt AS (SELECT doc_id, COUNT(*) AS t FROM hashed GROUP BY doc_id),
wins AS (
  SELECT h.doc_id, h.i AS j
  FROM hashed h JOIN cnt c USING (doc_id)
  WHERE h.i >= least({w}, c.t) - 1),
mins AS (
  SELECT ww.doc_id, ww.j, MIN(h2.h) AS mn
  FROM wins ww JOIN hashed h2
    ON h2.doc_id = ww.doc_id AND h2.i BETWEEN ww.j - {w - 1} AND ww.j
  GROUP BY ww.doc_id, ww.j),
sel AS (
  SELECT m.doc_id, MAX(h2.i) AS pos
  FROM mins m JOIN hashed h2
    ON h2.doc_id = m.doc_id AND h2.i BETWEEN m.j - {w - 1} AND m.j
   AND h2.h = m.mn
  GROUP BY m.doc_id, m.j)
SELECT DISTINCT s.doc_id, s.pos, h.h AS fp
FROM sel s JOIN hashed h ON h.doc_id = s.doc_id AND h.i = s.pos
""".strip()


def winnow_overlap_pairs(
    docs: "ray.data.Dataset",
    min_shared: int = 3,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
):
    """Content-overlap pairs: (a_id, b_id, n_shared) for docs sharing at
    least ``min_shared`` distinct winnowed fingerprint VALUES — the actual
    use of winnowing (MOSS-style overlap/plagiarism detection).

    Distributed shape identical to the MinHash bucket route: distinct
    (fp, doc_id) → range-sorted bucket pair emission (dedup._pairs_from_buckets,
    vectorized, no text through the shuffle) → two-phase pair count →
    threshold filter. A pathologically common fingerprint (boilerplate)
    would emit O(df²) pairs for its bucket — the same df-cap/verify
    trade-off documented for jaccard_pairs applies.

    Returns a pandas DataFrame (pair results are small relative to input)."""
    from log_parser_ray.stages.aggregate import grouped_count
    from log_parser_ray.stages.dedup import _pairs_from_buckets

    fps = winnow_fingerprints(docs, k=k, w=w)
    # distinct (fp, doc_id): a fingerprint value repeated WITHIN a doc (a
    # repeated phrase) must count once toward the pair overlap
    distinct = grouped_count(fps.select_columns(["fp", "doc_id"]),
                             ["fp", "doc_id"], alias="_n").drop_columns(["_n"])
    pairs = _pairs_from_buckets(distinct, "fp", "doc_id")
    counts = grouped_count(pairs, ["a_id", "b_id"], alias="n_shared").to_pandas()
    out = counts[counts["n_shared"] >= min_shared].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True)


def winnow_overlap_oracle_sql(
    min_shared: int = 3, k: int = WINNOW_K, w: int = WINNOW_W
) -> str:
    """SQL twin of ``winnow_overlap_pairs``: the full winnow oracle as a CTE,
    then a distinct-fp self-join with a pair-count threshold."""
    base = winnow_oracle_sql(k, w)
    head, _final = base.rsplit("SELECT DISTINCT", 1)
    return (
        head.rstrip()
        + f""",
fps AS (
  SELECT DISTINCT s.doc_id, h.h AS fp
  FROM sel s JOIN hashed h ON h.doc_id = s.doc_id AND h.i = s.pos)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}"""
    )


# ---------------------------------------------------------------------------
# deterministic hash-bucket sampling

SAMPLE_BUCKETS = 1 << 16  # md5 prefix granularity: 4 hex chars


def _bucket_threshold(keep_buckets: int) -> str:
    if not 0 <= keep_buckets <= SAMPLE_BUCKETS:
        raise ValueError(f"keep_buckets must be in [0, {SAMPLE_BUCKETS}]")
    if keep_buckets == SAMPLE_BUCKETS:
        return "g"  # > every 4-hex-char prefix (keep-all); '10000' would NOT be
    return f"{keep_buckets:04x}"


def sample_by_hash(
    ds: "ray.data.Dataset",
    key_col: str,
    keep_buckets: int,
    salt: str = "s0",
) -> "ray.data.Dataset":
    """Keep rows whose md5(key|salt) bucket < keep_buckets/65536.

    The hash input is ``str(key) + '|' + salt`` and the bucket is the first
    4 hex chars of the md5 — a lexicographic string compare, identical in
    Python and SQL, so the sample is engine-exact. Per-actor memo caching is
    pointless here (keys are unique); the md5 runs at C speed inside the
    batch. Sampling rate = keep_buckets / 65536.

    Scale shape: a pure filter — streams, no shuffle, no driver state; the
    same (salt, keep_buckets) always selects the same subset, so a resumed
    or re-run job samples identically."""
    thresh = _bucket_threshold(keep_buckets)
    suffix = "|" + salt

    def fn(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        mask = pa.array(
            [
                hashlib.md5((str(kk) + suffix).encode()).hexdigest()[:4] < thresh
                for kk in keys
            ]
        )
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_hash_predicate_sql(key_expr: str, keep_buckets: int, salt: str = "s0") -> str:
    """The WHERE-clause twin of ``sample_by_hash``."""
    thresh = _bucket_threshold(keep_buckets)
    return (
        f"substr(md5(CAST({key_expr} AS VARCHAR) || '|{salt}'), 1, 4) < '{thresh}'"
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    rates: Mapping[str, int],
    salt: str = "s0",
    default_buckets: int = 0,
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling: ``rates`` maps stratum value →
    keep_buckets (of 65536). Strata absent from ``rates`` use
    ``default_buckets`` (0 = drop). The per-row decision still hashes the
    KEY, so a document keeps the same fate if its stratum's rate is reused
    elsewhere — handy for building nested corpus subsets (10% ⊃ 1%)."""
    thresh = {s: _bucket_threshold(b) for s, b in rates.items()}
    default_t = _bucket_threshold(default_buckets)
    suffix = "|" + salt

    def fn(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        strata = t[stratum_col].to_pylist()
        mask = pa.array(
            [
                hashlib.md5((str(kk) + suffix).encode()).hexdigest()[:4]
                < thresh.get(s, default_t)
                for kk, s in zip(keys, strata)
            ]
        )
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# heavy hitters: Misra–Gries sketch + certified exactness

def _mg_summary(values, counts, capacity: int) -> dict:
    """Misra–Gries with ``capacity`` counters over a weighted stream."""
    mg: dict = {}
    for v, c in zip(values, counts):
        if v in mg:
            mg[v] += c
        elif len(mg) < capacity:
            mg[v] = c
        else:
            # decrement all by the min removable amount, in bulk
            dec = min(c, min(mg.values()))
            mg = {k: n - dec for k, n in mg.items() if n > dec}
            c -= dec
            if c > 0:
                mg[v] = c
    return mg


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int,
    capacity: int = 4096,
):
    """EXACT top-k most frequent values of ``col`` (ties broken by value
    ascending), using a Misra–Gries candidate pass that certifies its own
    exactness.

    Pass 1: each block reduces to a ≤``capacity``-entry MG summary via a
    local pyarrow group_by + weighted MG (the per-block summary rows are
    the only shuffle-free traffic; the block's DROPPED weight rides on the
    first summary row). Every MG decrement removes exactly
    dec×(capacity+1) weight, so a block's undercount for ANY value is
    ≤ dropped_b/(capacity+1), and merged summaries (plain addition, no
    further truncation) inherit the sum of the bounds:
    err = Σ_b dropped_b / (capacity+1) — computed exactly here because
    each dropped_b is a multiple of (capacity+1) by construction.

    Pass 2: recount the candidate values EXACTLY with one filtered
    two-phase grouped count (the shuffle carries candidate rows only). If
    the k-th exact candidate count > err, no non-candidate can reach the
    top-k → the result is certified exact without ever shuffling the full
    table. Otherwise fall back to the full exact grouped count (a
    distribution flat enough to defeat capacity=4096 has no meaningful
    top-k, but the answer stays exact either way). At extreme block counts
    the merged candidate set (≤ blocks × capacity) would itself be
    re-summarized first; at this repo's scales it is directly recountable.

    Returns a pandas DataFrame (≤ k rows): (col, n), n desc, value asc."""
    from log_parser_ray.stages.aggregate import grouped_count

    def summarize(t: pa.Table):
        vc = t.select([col]).group_by([col]).aggregate([([], "count_all")])
        vals = vc[col].to_pylist()
        cnts = vc["count_all"].to_pylist()
        mg = _mg_summary(vals, cnts, capacity)
        if not mg:
            return
        dropped = sum(cnts) - sum(mg.values())
        dcol = [dropped] + [0] * (len(mg) - 1)
        yield pa.table(
            {
                col: pa.array(list(mg.keys())),
                "mg_n": pa.array(list(mg.values()), type=pa.int64()),
                "dropped": pa.array(dcol, type=pa.int64()),
            }
        )

    parts = ds.map_batches(
        summarize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).to_pandas()
    if parts.empty:
        import pandas as pd

        return pd.DataFrame({col: [], "n": []})

    err = int(parts["dropped"].sum()) // (capacity + 1)
    candidates = parts[col].unique()

    cand_set = pa.array(sorted(candidates))
    filtered = ds.map_batches(
        lambda t: t.select([col]).filter(pc.is_in(t[col], value_set=cand_set)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    exact = grouped_count(filtered, [col], alias="n").to_pandas()
    exact = exact.sort_values(["n", col], ascending=[False, True], kind="stable")
    top = exact.head(k).reset_index(drop=True)
    kth = int(top["n"].iloc[-1]) if len(top) >= k else 0
    if len(top) >= k and kth > err:
        return top
    # uncertified → one full exact pass (still two-phase, still exact)
    full = grouped_count(ds.select_columns([col]), [col], alias="n").to_pandas()
    full = full.sort_values(["n", col], ascending=[False, True], kind="stable")
    return full.head(k).reset_index(drop=True)


def mix_corpus(
    docs: "ray.data.Dataset",
    weights: Mapping[str, float],
    token_budget: int,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> "ray.data.Dataset":
    """Deterministic weighted source mixing to a token budget — the
    Pile/Dolma "mixing" step (arXiv:2101.00027 §1, arXiv:2402.00159 §3.4):
    source s gets an allocation of floor(weights[s]/Σweights × budget)
    tokens; its docs are admitted in md5-hash order (a deterministic
    shuffle, the sample_by_hash convention) while the source's running
    token total BEFORE the doc is under the allocation — each source
    overshoots by at most one document, and a rerun/resume admits the
    identical subset. Sources absent from ``weights`` contribute nothing.

    Output: admitted (doc_id, source, n_tokens, cum_tokens), cum_tokens
    the within-source running total including the doc.

    Scale shape: one narrow projection (id, source, hash, token count —
    the text never leaves the reading task); ``ordered_prefix_sum``'s
    two-phase scan moves ONE number per block to the driver; the
    per-source offsets that convert the global running total to
    within-source totals come from a grouped max over the already-computed
    scan output (|sources| rows — a corpus has dozens of sources, not
    millions); admission is a stateless vectorized filter."""
    from log_parser_ray.stages.aggregate import grouped_stats, ordered_prefix_sum
    from log_parser_ray.stages.textops import WORD_RE

    total_w = sum(weights.values())
    alloc = {s: int(w / total_w * token_budget) for s, w in weights.items()}
    suffix = "|" + salt

    def narrow_fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = pa.array(
            [
                hashlib.md5((str(i) + suffix).encode()).hexdigest()[:8]
                for i in ids
            ],
            pa.string(),
        )
        n_tok = pc.cast(
            pc.count_substring_regex(pc.utf8_lower(t[text_col]), WORD_RE),
            pa.int64(),
        )
        return pa.table(
            {
                id_col: t[id_col],
                source_col: t[source_col],
                "h": h,
                "n_tokens": n_tok,
            }
        )

    narrow = docs.map_batches(
        narrow_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    cum = ordered_prefix_sum(
        narrow, [source_col, "h", id_col], "n_tokens", alias="cum"
    )

    # global→within-source offsets: previous sources' grand totals in the
    # scan's own (ascending source) order
    import pandas as pd

    mx = grouped_stats(cum, [source_col], "cum", count=None, max_="mx").to_pandas()
    if source_col not in mx.columns:  # all-empty Dataset drops the schema
        mx = pd.DataFrame({source_col: pd.Series([], dtype=str),
                           "mx": pd.Series([], dtype="int64")})
    mx = mx.sort_values(source_col).reset_index(drop=True)
    srcs = mx[source_col].tolist()
    # offset[s_i] = max global cum of s_{i-1} (the scan is contiguous per
    # source, so the previous source's last cum IS the exclusive prefix)
    offs = np.concatenate(([0], mx["mx"].to_numpy()[:-1]))
    src_arr = pa.array(srcs, pa.string())
    off_arr = np.asarray(offs, dtype=np.int64)
    alloc_arr = np.array([alloc.get(s, 0) for s in srcs], dtype=np.int64)

    def admit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    source_col: pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "cum_tokens": pa.array([], pa.int64()),
                }
            )
        code = pc.index_in(t[source_col], value_set=src_arr).to_numpy(
            zero_copy_only=False
        )
        g = t["cum"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        within = g - off_arr[code]
        keep = (within - n) < alloc_arr[code]
        out = pa.table(
            {
                id_col: t[id_col],
                source_col: t[source_col],
                "n_tokens": t["n_tokens"],
                "cum_tokens": pa.array(within, pa.int64()),
            }
        )
        return out.filter(pa.array(keep))

    # schema-stable under an all-empty corpus (the line_dedup seed trick:
    # an empty typed table unioned in keeps to_pandas from dropping columns)
    seed = ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array([], pa.int64()),
                source_col: pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "cum_tokens": pa.array([], pa.int64()),
            }
        )
    )
    return seed.union(
        cum.map_batches(admit, batch_format="pyarrow", zero_copy_batch=True)
    )
