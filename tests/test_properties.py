"""Property tests (hypothesis): the aggregate toolkit matches pandas ground
truth on arbitrary key/value distributions, and routing is always a strict
partition of rows, for any text content."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from log_parser_ray.schema import SINKS
from log_parser_ray.stages.aggregate import distinct_count, grouped_count, grouped_stats
from log_parser_ray.stages.parse import make_parser

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys_st = st.lists(
    st.sampled_from(["a", "b", "c", "hot", "x1", "x2"]), min_size=1, max_size=300
)
vals_st = st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=300)


@_slow
@given(keys=keys_st, data=st.data())
def test_grouped_count_matches_pandas(ray_session, keys, data):
    df = pd.DataFrame({"k": keys})
    ds = ray.data.from_pandas(df).repartition(4)
    got = grouped_count(ds, ["k"], alias="n").to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k").size().reset_index(name="n")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@_slow
@given(keys=keys_st)
def test_stats_and_distinct_match_pandas(ray_session, keys):
    rs = np.random.RandomState(len(keys))
    df = pd.DataFrame({"k": keys, "v": rs.randint(-50, 50, len(keys))})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (
        grouped_stats(ds, ["k"], "v", count="n", sum_="s", min_="mn", max_="mx")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        df.groupby("k")
        .agg(n=("v", "count"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    gd = distinct_count(ds, ["k"], "v", alias="nd").to_pandas().sort_values("k").reset_index(drop=True)
    wd = df.groupby("k")["v"].nunique().reset_index(name="nd")
    pd.testing.assert_frame_equal(gd, wd, check_dtype=False)


texts_st = st.lists(
    st.one_of(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80),
        st.sampled_from(
            [
                "ERROR [WSVR0042E] thread hung for 99 ms",
                '<tool_call name="search" status="ok" rt_us=5000000>',
                "GET /x status=404",
                "login uid=u9",
                "anything CORBA.X.NO_RESPONSE here",
                "",
            ]
        ),
    ),
    min_size=1,
    max_size=100,
)


@_slow
@given(texts=texts_st)
def test_routing_is_total_partition(ray_session, texts):
    """Every row — arbitrary unicode text included — lands in exactly one
    known sink, and sink counts sum to the input size."""
    n = len(texts)
    batch = pa.table(
        {
            "conv_id": pa.array(["c"] * n),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts, pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )
    out = make_parser()(batch)
    sinks = out["sink"].to_pylist()
    assert len(sinks) == n
    assert all(s in SINKS for s in sinks)


docs_st = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "Share this", "", "x y z", "tail"]),
        min_size=0, max_size=5,
    ),
    min_size=1, max_size=12,
)


@_slow
@given(line_lists=docs_st)
def test_line_dedup_matches_bruteforce(ray_session, line_lists):
    """line_dedup equals the serial census+filter+rejoin on arbitrary
    doc/line combinations (any duplication pattern, empty lines, empty
    docs), across forced block splits."""
    from collections import Counter

    from log_parser_ray.stages.dedup import line_dedup

    docs = pd.DataFrame({
        "doc_id": list(range(len(line_lists))),
        "text": ["\n".join(ls) for ls in line_lists],
    })
    deduped = line_dedup(ray.data.from_pandas(docs).repartition(3))
    out = deduped.to_pandas()
    lines = [(d, l) for d, t in zip(docs.doc_id, docs.text)
             for l in t.split("\n")]
    nd = Counter()
    for _, l in {(d, l) for d, l in lines if l != ""}:
        nd[l] += 1
    boiler = {l for l, c in nd.items() if c >= 2}
    exp = {}
    for d, t in zip(docs.doc_id, docs.text):
        kept = [l for l in t.split("\n") if l not in boiler]
        if kept:
            exp[d] = "\n".join(kept)
    if len(out) == 0:
        # Ray's to_pandas drops ALL columns from an all-empty Dataset (the
        # weblog.py:443 quirk) — the Dataset itself keeps (doc_id, text)
        # thanks to line_dedup's typed seed block
        assert exp == {}
        assert deduped.schema().names == ["doc_id", "text"]
    else:
        assert dict(zip(out["doc_id"], out["text"])) == exp


c4_line_st = st.lists(
    st.sampled_from([
        "one two three four five six.",  # kept
        "short line.",                    # <5 words
        "five whole words but no mark",   # no terminal punct
        "the javascript rule fires on this line.",
        "does this question line qualify today?",
        'a quoted ending with five words"',
        "", "{ brace }", "lorem ipsum dolor sit amet here.",
    ]),
    min_size=0, max_size=6,
)


@_slow
@given(line_lists=st.lists(c4_line_st, min_size=1, max_size=10))
def test_c4_clean_matches_bruteforce(ray_session, line_lists):
    """c4_clean equals the serial line-filter + doc-rule + rejoin on
    arbitrary line combinations (triggers for every rule in the pool)."""
    import re

    from log_parser_ray.stages import textops as t

    docs = pd.DataFrame({
        "doc_id": list(range(len(line_lists))),
        "text": ["\n".join(ls) for ls in line_lists],
    })
    out = t.c4_clean(ray.data.from_pandas(docs).repartition(3)).to_pandas()

    exp = {}
    for d, txt in zip(docs.doc_id, docs.text):
        lines = txt.split("\n")
        kept = [
            l for l in lines
            if re.search(t.C4_LINE_END_RE, l)
            and len(re.findall(t.WORD_RE, l.lower())) >= t.C4_MIN_LINE_WORDS
            and not re.search(t.C4_JS_RE, l.lower())
        ]
        if (len(kept) >= t.C4_MIN_KEPT_LINES
                and t.C4_LOREM not in txt.lower() and "{" not in txt):
            exp[d] = (len(lines), len(kept), "\n".join(kept))
    got = {r.doc_id: (r.n_lines, r.n_kept, r.text) for r in out.itertuples()}
    assert got == exp


@_slow
@given(texts=st.lists(
    st.text(
        alphabet="the bofandwih\n.-*…#!?\"5 ",  # letters cover the req stopwords
        min_size=0, max_size=120,
    ),
    min_size=1, max_size=8,
))
def test_gopher_quality_matches_bruteforce(ray_session, texts):
    """gopher_quality metrics and verdict equal a serial `re` computation on
    arbitrary text (multiline bullets/ellipses, symbols, degenerate docs)."""
    import re

    from log_parser_ray.stages import textops as t

    docs = pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    out = (
        t.gopher_quality(ray.data.from_pandas(docs).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, txt in enumerate(texts):
        low = txt.lower()
        n_words = len(re.findall(t.WORD_RE, low))
        wf = max(n_words, 1.0)
        n_lines = txt.count("\n") + 1
        mwl = round(len(re.findall(t.WORD_CHAR_RE, low)) / wf, 6)
        sym = round(len(re.findall(t.SYMBOL_RE, txt)) / wf, 6)
        bullet = round(len(re.findall(t.BULLET_RE, txt)) / n_lines, 6)
        ell = round(len(re.findall(t.ELLIPSIS_RE, txt)) / n_lines, 6)
        alpha = round(len(re.findall(t.ALPHA_WORD_RE, low)) / wf, 6)
        req = sum(
            bool(re.search(rf"\b{w}\b", low)) for w in t.GOPHER_REQ_STOPWORDS)
        r = out.iloc[i]
        assert (r.n_words, r.n_req_stop) == (n_words, req)
        assert (r.mean_word_len, r.symbol_ratio, r.bullet_frac,
                r.ellipsis_frac, r.alpha_frac) == (mwl, sym, bullet, ell, alpha)
        want_pass = (
            t.GOPHER_MIN_WORDS <= n_words <= t.GOPHER_MAX_WORDS
            and t.GOPHER_MIN_MWL <= mwl <= t.GOPHER_MAX_MWL
            and sym <= t.GOPHER_MAX_SYMBOL_RATIO
            and bullet <= t.GOPHER_MAX_BULLET_FRAC
            and ell <= t.GOPHER_MAX_ELLIPSIS_FRAC
            and alpha >= t.GOPHER_MIN_ALPHA_FRAC
            and req >= t.GOPHER_MIN_REQ_STOP
        )
        assert bool(r.passed) == want_pass
