"""Text-analysis operators over a document table (doc_id, text, lang, source).

The large-scale-training-data toolkit the reference lacks: quality scoring,
token counting, language-ID and content fingerprinting, each a vectorized
``map_batches`` stage (Arrow kernels, zero-copy) that streams — no stage here
materializes the corpus. Regex patterns are shared verbatim with the DuckDB
oracle SQL (both engines run RE2), so every op is value-checkable.

Reference analogue: the per-line scalar derivations of SURVEY.md §2.2
(M10 bucketing, M11 UA-classifier regex cascade, M18 unit normalization) —
same shape, applied to document text instead of log lines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Tokenizer patterns — IDENTICAL strings are used in the oracle SQL.
WORD_RE = "[a-z0-9]+"
# BPE-ish tokenization: letter runs, digit runs, single punctuation marks.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "on", "for")
STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
# language-ID heuristic: >=2 English stopword hits → 'en' (n-gram/stopword
# heuristics are the standard cheap lang-ID; fasttext et al. would slot into
# the same map_batches stage as an actor pool with the model in __init__).
LANG_EN_MIN_HITS = 2


def quality_arrays(text: "pa.ChunkedArray | pa.Array"):
    """The quality-metric kernels: (n_words int64, n_stopwords int64,
    stop_ratio float64 round-6dp). SHARED by quality_stats and the
    single-scan curation path (dedup.minhash_signatures with_quality) — the
    curation SQL oracle depends on the two staying byte-identical, so there
    is exactly one definition."""
    low = pc.utf8_lower(text)
    n_words = pc.count_substring_regex(low, WORD_RE)
    n_stop = pc.count_substring_regex(low, STOP_RE)
    ratio = pc.round(
        pc.divide(
            pc.cast(n_stop, pa.float64()),
            pc.max_element_wise(pc.cast(n_words, pa.float64()), 1.0),
        ),
        ndigits=6,
    )
    return (
        pc.cast(n_words, pa.int64()),
        pc.cast(n_stop, pa.int64()),
        ratio,
    )


def quality_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc quality metrics: char/word/stopword counts + stopword ratio.

    Vectorized: three RE2 kernels per batch, no Python row loop."""

    def fn(t: pa.Table) -> pa.Table:
        n_words, n_stop, ratio = quality_arrays(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "len_chars": pc.utf8_length(t["text"]),
                "n_words": n_words,
                "n_stopwords": n_stop,
                "stop_ratio": ratio,
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446 §A.1.1),
# the rule set reused by FineWeb / Dolma / RedPajama-v2. Every pattern below
# is RE2 and IDENTICAL in the DuckDB oracle; counts agree kernel-for-kernel
# (probed: count_substring_regex == len(regexp_extract_all) on all five).
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1     # '#' or '...' per word
GOPHER_MAX_BULLET_FRAC = 0.9      # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_FRAC = 0.3    # lines ending with an ellipsis
GOPHER_MIN_ALPHA_FRAC = 0.8       # words containing a letter
GOPHER_REQ_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_REQ_STOP = 2
BULLET_BODY_RE = r"[ \t]*[-*•]"
BULLET_RE = r"(?m)^" + BULLET_BODY_RE  # the SQL twin's form (DuckDB counts
# (?m)^ correctly; Arrow does not — see gopher_quality's decomposition)
ELLIPSIS_RE = r"(?m)(\.\.\.|…)$"
SYMBOL_RE = r"#|\.\.\."
ALPHA_WORD_RE = "[a-z0-9]*[a-z][a-z0-9]*"
WORD_CHAR_RE = "[a-z0-9]"


def gopher_quality(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc Gopher rule metrics + the pass verdict.

    One zero-copy ``map_batches``: ~14 RE2 count/match kernels per batch,
    no explode, no shuffle, nothing to the driver — embarrassingly parallel
    at any corpus size. Ratios are exact rationals of integer counts rounded
    half-even to 6 dp on both engines (the house float protocol)."""

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        f64 = pa.float64()

        def cnt(arr, pat):
            return pc.cast(pc.count_substring_regex(arr, pat), pa.int64())

        n_words = cnt(low, WORD_RE)
        wf = pc.max_element_wise(pc.cast(n_words, f64), 1.0)
        mean_word_len = pc.round(
            pc.divide(pc.cast(cnt(low, WORD_CHAR_RE), f64), wf), ndigits=6)
        symbol_ratio = pc.round(
            pc.divide(pc.cast(cnt(t["text"], SYMBOL_RE), f64), wf), ndigits=6)
        n_lines = pc.add(cnt(t["text"], "\n"), 1)
        lf = pc.cast(n_lines, f64)
        # Arrow's count_substring_regex re-anchors ^ at each scan resume
        # ('--' counts 2 under BULLET_RE; Python re and DuckDB count 1), so
        # bullet lines decompose to interior \n-prefixed matches + a
        # text-start match — probed equal to re/DuckDB on adjacent-bullet
        # edges. $ anchors are safe (end positions never shift).
        n_bullet = pc.add(
            cnt(t["text"], "\n" + BULLET_BODY_RE),
            pc.cast(
                pc.match_substring_regex(t["text"], "^" + BULLET_BODY_RE),
                pa.int64()),
        )
        bullet_frac = pc.round(pc.divide(pc.cast(n_bullet, f64), lf), ndigits=6)
        ellipsis_frac = pc.round(
            pc.divide(pc.cast(cnt(t["text"], ELLIPSIS_RE), f64), lf), ndigits=6)
        alpha_frac = pc.round(
            pc.divide(pc.cast(cnt(low, ALPHA_WORD_RE), f64), wf), ndigits=6)
        n_req = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        for w in GOPHER_REQ_STOPWORDS:
            hit = pc.match_substring_regex(low, rf"\b{w}\b")
            n_req = pc.add(n_req, pc.cast(hit, pa.int64()))
        passed = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(n_words, GOPHER_MIN_WORDS),
                        pc.less_equal(n_words, GOPHER_MAX_WORDS)),
                pc.and_(pc.greater_equal(mean_word_len, GOPHER_MIN_MWL),
                        pc.less_equal(mean_word_len, GOPHER_MAX_MWL)),
            ),
            pc.and_(
                pc.and_(pc.less_equal(symbol_ratio, GOPHER_MAX_SYMBOL_RATIO),
                        pc.less_equal(bullet_frac, GOPHER_MAX_BULLET_FRAC)),
                pc.and_(
                    pc.and_(
                        pc.less_equal(ellipsis_frac, GOPHER_MAX_ELLIPSIS_FRAC),
                        pc.greater_equal(alpha_frac, GOPHER_MIN_ALPHA_FRAC)),
                    pc.greater_equal(n_req, GOPHER_MIN_REQ_STOP),
                ),
            ),
        )
        return pa.table({
            "doc_id": t["doc_id"], "n_words": n_words,
            "mean_word_len": mean_word_len, "symbol_ratio": symbol_ratio,
            "bullet_frac": bullet_frac, "ellipsis_frac": ellipsis_frac,
            "alpha_frac": alpha_frac, "n_req_stop": n_req, "passed": passed,
        })

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2). The
# published badwords list is out of scope (no network); every other rule is
# implemented. "At least 3 sentences" uses kept lines as the sentence proxy
# (each kept line ends in terminal punctuation, so kept lines lower-bound
# sentences) — documented divergence, same on both engines.
C4_LINE_END_RE = r'[.!?"]$'
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_JS_RE = "javascript"
C4_LOREM = "lorem ipsum"


def c4_clean(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """C4 line/document cleaning: keep lines that end in terminal
    punctuation, have ≥5 words and don't mention javascript; drop documents
    containing 'lorem ipsum' or '{' or with <3 kept lines; rejoin survivors.

    Scale shape: line filtering is purely per-document, so the WHOLE op is
    one ``map_batches`` — split to a list array, evaluate the line predicate
    on the flattened child (three RE2 kernels over every line at once),
    rebuild each doc's kept-line list from the batch-local parent indices
    (numpy bincount; parent indices of a flatten are already sorted), and
    ``binary_join``. No explode leaves the task, no shuffle, no driver
    collect."""

    def _cc(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    def fn(t: pa.Table) -> pa.Table:
        toks = _cc(pc.split_pattern(t["text"], "\n"))
        flat = _cc(pc.list_flatten(toks))
        parent = _cc(pc.list_parent_indices(toks))
        lowl = pc.utf8_lower(flat)
        keep_line = pc.and_(
            pc.and_(
                pc.match_substring_regex(flat, C4_LINE_END_RE),
                pc.greater_equal(
                    pc.count_substring_regex(lowl, WORD_RE), C4_MIN_LINE_WORDS),
            ),
            pc.invert(pc.match_substring_regex(lowl, C4_JS_RE)),
        )
        kept_flat = flat.filter(keep_line)
        kept_parent = parent.filter(keep_line).to_numpy(zero_copy_only=False)
        n = t.num_rows
        n_lines = pc.cast(pc.list_value_length(toks), pa.int64())
        n_kept = np.bincount(kept_parent, minlength=n).astype(np.int64)
        # rebuild list<string> of kept lines per doc: flatten parent indices
        # are non-decreasing, so offsets are the cumulative kept counts
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(n_kept, out=offsets[1:])
        kept_lists = pa.ListArray.from_arrays(pa.array(offsets), _cc(kept_flat))
        doc_ok = pc.and_(
            pc.and_(
                pa.array(n_kept >= C4_MIN_KEPT_LINES),
                pc.invert(pc.match_substring(pc.utf8_lower(t["text"]), C4_LOREM)),
            ),
            pc.invert(pc.match_substring(t["text"], "{")),
        )
        out = pa.table({
            "doc_id": t["doc_id"], "n_lines": n_lines,
            "n_kept": pa.array(n_kept), "text": pc.binary_join(kept_lists, "\n"),
        })
        return out.filter(doc_ok)

    # seed one typed empty block so an all-filtered corpus keeps the schema
    # (Ray never calls the fn on an empty batch — line_dedup's regression)
    seed = ray.data.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64()),
                   ("n_kept", pa.int64()), ("text", pa.string())])
        .empty_table()
    )
    return seed.union(
        docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True))


def token_counts_by_source(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(source) → n_docs, sum_tokens under the BPE-ish tokenizer — the
    "how many tokens is this corpus" question, two-phase aggregated."""
    from log_parser_ray.stages.aggregate import grouped_stats

    def fn(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.count_substring_regex(t["text"], BPE_RE), pa.int64())
        return pa.table({"source": t["source"], "n_tokens": n_tok})

    per_doc = docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_stats(per_doc, ["source"], "n_tokens", count="n_docs", sum_="sum_tokens")


def doc_term_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode documents to exact per-(doc_id, source, term) counts.

    Fully vectorized: split on the complement of WORD_RE (one RE2 kernel),
    flatten the list column with parent indices (zero-copy take), drop empty
    fragments, then one pyarrow group_by per batch. Exact WITHOUT a shuffle
    because each document is one input row, so all its tokens are in one
    batch — the exploded token stream never leaves the task. Output volume is
    per-doc vocabulary, not token count."""

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        toks = pc.split_pattern_regex(low, f"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        tbl = pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parent),
                "source": pc.take(t["source"].combine_chunks(), parent),
                "term": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        out = tbl.group_by(["doc_id", "source", "term"]).aggregate([([], "count_all")])
        return out.rename_columns(["doc_id", "source", "term", "cnt"])

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms(docs: "ray.data.Dataset", k: int = 5) -> "ray.data.Dataset":
    """Top-k corpus-characteristic terms per source by tf/df — the TF-IDF
    keyword-extraction shape over the documents table (two shared shuffles:
    term-frequency per (source, term) and document-frequency per term, hash
    joined on term). The ranking score tf/df is one IEEE double division on
    both engines (identical ordering); the EMITTED columns are exact integers
    and strings, so the result is hash-safe."""
    from log_parser_ray.stages.aggregate import (
        group_safe_map,
        grouped_count,
        grouped_stats,
        merge_join,
    )

    per = doc_term_counts(docs)
    tf = grouped_stats(per, ["source", "term"], "cnt", count=None, sum_="tf")
    df = grouped_count(per, ["term"], alias="df")
    joined = merge_join(
        tf, df, on="term", how="inner",
        left_schema=pa.schema(
            [("source", pa.string()), ("term", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )

    def pick(g):
        import pandas as pd  # noqa: F401

        g = g.assign(_score=g["tf"].to_numpy() / g["df"].to_numpy())
        g = g.sort_values(["_score", "term"], ascending=[False, True], kind="stable")
        out = g.groupby("source", sort=False).head(k)
        return out[["source", "term", "tf", "df"]]

    return group_safe_map(joined, ["source"], pick, batch_format="pandas")


def lang_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Append predicted language column (stopword-hit heuristic)."""

    def fn(t: pa.Table) -> pa.Table:
        hits = pc.count_substring_regex(pc.utf8_lower(t["text"]), STOP_RE)
        pred = pc.if_else(
            pc.greater_equal(hits, LANG_EN_MIN_HITS), "en", "unk"
        )
        return t.append_column("pred_lang", pred)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _explode_terms(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """(flat lowercase terms, parent doc row index) for one batch — the
    shared explode used by the repetition / decontamination ops. One RE2
    split kernel + zero-copy flatten; empty fragments dropped with the
    parent indices kept aligned."""
    low = pc.utf8_lower(t["text"])
    toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
    flat = pc.list_flatten(toks).combine_chunks()
    parent = pc.list_parent_indices(toks).combine_chunks()
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parent.filter(keep).to_numpy(zero_copy_only=False)


def repetition_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Gopher-style repetition quality flags per document.

    For each doc: word count, distinct-word count, the duplicate-word ratio
    ``(n_words - n_distinct) / n_words`` and the top-bigram fraction
    ``max bigram count / n_bigrams`` — the "is this document mostly one
    phrase repeated" signals used by published web-corpus quality filters
    (Gopher §A.2 repetition rules). Fully vectorized: the batch explodes to
    a flat term array once; distinct and bigram counts are per-batch Arrow
    ``group_by``s keyed by (doc row, term[, next term]) — each doc's tokens
    live inside its own row, so the exploded stream never leaves the task
    and there is NO shuffle. Ratios are exact rationals of counts rounded
    half-even on both engines."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat, parent = _explode_terms(t)
        n_words = np.zeros(n, dtype=np.int64)
        np.add.at(n_words, parent, 1)

        dist = (
            pa.table({"p": parent, "w": flat})
            .group_by(["p", "w"])
            .aggregate([([], "count_all")])
        )
        n_distinct = np.zeros(n, dtype=np.int64)
        np.add.at(n_distinct, dist["p"].to_numpy(zero_copy_only=False), 1)

        # bigrams: adjacent flat positions with the same parent doc
        top_c = np.zeros(n, dtype=np.int64)
        n_bg = np.zeros(n, dtype=np.int64)
        if len(flat) > 1:
            same = parent[:-1] == parent[1:]
            bg = pa.table(
                {
                    "p": pa.array(parent[:-1][same]),
                    "w1": flat.slice(0, len(flat) - 1).filter(pa.array(same)),
                    "w2": flat.slice(1).filter(pa.array(same)),
                }
            ).group_by(["p", "w1", "w2"]).aggregate([([], "count_all")])
            bp = bg["p"].to_numpy(zero_copy_only=False)
            bc = bg["count_all"].to_numpy(zero_copy_only=False)
            np.add.at(n_bg, bp, bc)
            np.maximum.at(top_c, bp, bc)

        dup_ratio = np.round((n_words - n_distinct) / np.maximum(n_words, 1), 6)
        top_frac = np.round(top_c / np.maximum(n_bg, 1), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_distinct": pa.array(n_distinct),
                "dup_word_ratio": pa.array(dup_ratio),
                "top_bigram_frac": pa.array(top_frac),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# Decontamination: docs whose doc_id ≡ 0 (mod EVAL_MOD) form the held-out
# "benchmark" set; training docs sharing any NGRAM_N-gram with it are flagged
# (the GPT-3 appendix-C / open-data decontamination shape). The eval side is
# SMALL by construction — benchmark suites are thousands of docs, not
# billions — so its n-gram set broadcasts (ray.put once, read per task)
# while the training corpus streams.
EVAL_MOD = 50
NGRAM_N = 8


def eval_ngram_set(docs: "ray.data.Dataset", n: int = NGRAM_N) -> set[str]:
    """Collect the benchmark-side n-gram strings (space-joined token runs).

    Materializes ONLY the eval slice (doc_id % EVAL_MOD == 0) — the small
    side of the decontamination join."""
    # doc_id % EVAL_MOD == 0 via subtract/multiply/divide (pyarrow has no
    # modulo kernel; integer divide truncates, doc_id is non-negative)
    ev = docs.map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], EVAL_MOD), EVAL_MOD),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    grams: set[str] = set()
    for batch in ev.iter_batches(batch_format="pyarrow"):
        flat, parent = _explode_terms(pa.table(batch))
        grams.update(_ngram_strings(flat, parent, n)[0].to_pylist())
    return grams


def _ngram_strings(flat: pa.Array, parent: np.ndarray, n: int):
    """(space-joined n-gram array, parent doc index per gram) from the
    exploded term stream — n-1 shifted zero-copy slices joined element-wise,
    masked to runs that stay within one document."""
    m = len(flat) - n + 1
    if m <= 0:
        return pa.array([], type=pa.string()), np.array([], dtype=parent.dtype)
    mask = parent[: m] == parent[n - 1:]
    shifts = [flat.slice(i, m) for i in range(n)]
    grams = pc.binary_join_element_wise(*shifts, " ")
    amask = pa.array(mask)
    return grams.filter(amask), parent[:m][mask]


def decontaminate(docs: "ray.data.Dataset", n: int = NGRAM_N) -> "ray.data.Dataset":
    """Per training doc: how many of its n-gram occurrences hit the
    benchmark set, and the contaminated flag. Output (doc_id, n_hits,
    contaminated) over the non-eval docs."""
    grams = eval_ngram_set(docs, n)
    import ray

    grams_ref = ray.put(pa.array(sorted(grams), type=pa.string()))

    def fn(t: pa.Table, ref=grams_ref) -> pa.Table:
        import ray as _ray

        value_set = _ray.get(ref)
        mod = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], EVAL_MOD), EVAL_MOD)
        )
        t = t.filter(pc.not_equal(mod, 0))
        nrows = t.num_rows
        flat, parent = _explode_terms(t)
        g, gp = _ngram_strings(flat, parent, n)
        hits = np.zeros(nrows, dtype=np.int64)
        if len(g):
            isin = pc.is_in(g, value_set=value_set).to_numpy(zero_copy_only=False)
            np.add.at(hits, gp[isin], 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _non_eval(t: pa.Table) -> pa.Table:
    mod = pc.subtract(
        t["doc_id"], pc.multiply(pc.divide(t["doc_id"], EVAL_MOD), EVAL_MOD)
    )
    return t.filter(pc.not_equal(mod, 0))


def decontaminate_join(docs: "ray.data.Dataset", n: int = NGRAM_N) -> "ray.data.Dataset":
    """Decontamination via a DISTRIBUTED gram join — the scale path for an
    eval set too large to broadcast (``decontaminate`` above ships the gram
    set via ``ray.put``, which is the right call only while it fits worker
    memory; its docstring carried this as a noted limit). Identical output:
    (doc_id, n_hits, contaminated) over the non-eval docs.

    Shape: eval docs explode to a globally-distinct gram Dataset; training
    docs explode to (doc_id, gram) OCCURRENCE rows (multiplicity kept); a
    sort-merge LEFT SEMI join keeps each occurrence iff its gram is in the
    eval table; per-doc counts and a left-outer join back onto the doc spine
    fill zero for clean docs. Every step is a task-based range shuffle —
    nothing is collected or broadcast."""
    from log_parser_ray.stages.aggregate import (
        grouped_count,
        merge_join,
        sorted_combine,
    )

    def eval_grams_fn(t: pa.Table) -> pa.Table:
        mod = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], EVAL_MOD), EVAL_MOD)
        )
        t = t.filter(pc.equal(mod, 0))
        flat, parent = _explode_terms(t)
        g, _ = _ngram_strings(flat, parent, n)
        return pa.table({"g": g}).group_by(["g"]).aggregate([])

    ev = sorted_combine(
        docs.map_batches(eval_grams_fn, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [], keep=["g"],
    )

    def occ_fn(t: pa.Table) -> pa.Table:
        t = _non_eval(t)
        flat, parent = _explode_terms(t)
        g, gp = _ngram_strings(flat, parent, n)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gp]
        return pa.table({"g": g, "doc_id": pa.array(ids, pa.int64())})

    occ = docs.map_batches(occ_fn, batch_format="pyarrow", zero_copy_batch=True)
    hits = merge_join(
        occ, ev, on="g", how="left_semi",
        left_schema=pa.schema([("g", pa.string()), ("doc_id", pa.int64())]),
        right_schema=pa.schema([("g", pa.string())]),
    )
    counts = grouped_count(hits, ["doc_id"], alias="n_hits")

    ids = docs.map_batches(
        lambda t: _non_eval(t).select(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    withc = merge_join(
        ids, counts, on="doc_id", how="left_outer",
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        hitsc = pc.fill_null(t["n_hits"], 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": hitsc,
                "contaminated": pc.greater(hitsc, 0),
            }
        )

    return withc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def md5_hex(texts) -> list[str]:
    """Stable content fingerprint (hex md5) — matches DuckDB md5(text)."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]


def fingerprint(docs: "ray.data.Dataset", col: str = "text") -> "ray.data.Dataset":
    """Append an md5 content fingerprint column.

    The per-row hashlib call runs at C speed inside the batch; a vectorized
    xxhash/cityhash kernel would slot in the same place if available."""

    def fn(t: pa.Table) -> pa.Table:
        fp = pa.array(md5_hex(t[col].to_pylist()), type=pa.string())
        return t.append_column("fp", fp)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash64(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Append a 64-bit SimHash fingerprint (hex) of the word unigram multiset.

    Charikar simhash: each token hashes to 64 bits; bit b of the fingerprint
    is 1 iff the (count-weighted) sum of ±1 votes over tokens is positive.
    Near-identical docs differ in few bits → near-dup detection by Hamming
    distance (see dedup.simhash_candidate_pairs)."""

    shift = np.arange(64, dtype=np.uint64)
    bit_cache: dict[str, np.ndarray] = {}  # token → ±1 bit votes (vocab is tiny)

    def token_bits(tok: str) -> np.ndarray:
        v = bit_cache.get(tok)
        if v is None:
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
            )
            v = (2 * ((h >> shift) & np.uint64(1)).astype(np.int64) - 1)
            bit_cache[tok] = v
        return v

    def fn(t: pa.Table) -> pa.Table:
        # vectorized: one explode per batch, md5 once per DISTINCT token
        # (np.unique + cache), then one grouped ±1-vote accumulation
        # (np.add.at over the parent index) — no per-doc Python loop
        n = t.num_rows
        flat, parent = _explode_terms(t)
        votes = np.zeros((n, 64), dtype=np.int64)
        if len(flat):
            toks = flat.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(toks, return_inverse=True)
            bits = np.stack([token_bits(u) for u in uniq])  # (n_uniq, 64)
            np.add.at(votes, parent, bits[inv])
        fp = np.packbits((votes > 0).astype(np.uint8), axis=1,
                         bitorder="little").view(np.uint64).reshape(-1)
        fps = [f"{int(x):016x}" for x in fp]
        return t.append_column("simhash", pa.array(fps, type=pa.string()))

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_sequences(
    docs: "ray.data.Dataset", budget: int = 2048
) -> "ray.data.Dataset":
    """Contiguous token-budget SHARD ASSIGNMENT — the sequence-packing step
    of a training-data pipeline: documents are laid end to end in doc_id
    order and cut into shards of ``budget`` tokens; each doc is assigned the
    shard its first token lands in.

    Output per doc: (doc_id, n_tokens, offset = global token position of
    the doc's first token, bin_id = offset // budget). Token count is the
    WORD_RE kernel shared with quality_stats, so the SQL twin is exact:
    ``SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)``.

    Scale shape: one stateless count pass, then a distributed ordered
    prefix sum (aggregate.ordered_prefix_sum — per-block totals to the
    driver, one number per block, never rows)."""
    from log_parser_ray.stages.aggregate import ordered_prefix_sum

    def count(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(pc.utf8_lower(t["text"]), WORD_RE),
            pa.int64(),
        )
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    counted = docs.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
    cum = ordered_prefix_sum(counted, ["doc_id"], "n_tokens", alias="_cum")

    def finish(t: pa.Table) -> pa.Table:
        offset = pc.subtract(t["_cum"], t["n_tokens"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "offset": offset,
                # integer division: offsets are non-negative, so int64
                # truncation == floor, exact at any corpus size
                "bin_id": pc.divide(offset, budget),
            }
        )

    return cum.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
