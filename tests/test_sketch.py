"""Tests for sampling / winnowing / heavy-hitter operators (stages/sketch.py).

The SQL-twin equality for all three ops is covered by check_correctness
(winnow_fingerprints / hash_sample / stratified_sample / heavy_hitter_terms);
these tests pin the ALGORITHMIC properties the oracle can't express:
winnowing's coverage guarantee, sampling's nesting/disjointness, and the
sketch's certified-exactness contract.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from log_parser_ray.stages.sketch import (
    WINNOW_K,
    WINNOW_W,
    _mg_summary,
    heavy_hitters,
    sample_by_hash,
    stratified_sample,
    winnow_fingerprints,
)


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


# ---------------------------------------------------------------------------
# winnowing


def test_winnow_deterministic_and_parallelism_invariant(ray_session):
    texts = [f"the quick brown fox {i} jumps over the lazy dog {i * 7}" for i in range(40)]
    one = winnow_fingerprints(_docs(texts)).to_pandas()
    many = winnow_fingerprints(_docs(texts).repartition(13)).to_pandas()
    key = ["doc_id", "pos"]
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True),
    )


def test_winnow_guarantee_shared_fingerprint_on_long_match(ray_session):
    """Winnowing guarantee: two docs sharing a substring of length ≥ w+k-1
    (in normalized space) share at least one fingerprint VALUE."""
    shared = "abcdefghijklmnopqrstuvwxyz0123456789"  # 36 ≥ k+w-1 = 11
    a = "XX!! " + shared + " and some unrelated tail here"
    b = "totally different head text " + shared + " ??YY"
    fps = winnow_fingerprints(_docs([a, b])).to_pandas()
    f0 = set(fps[fps.doc_id == 0]["fp"])
    f1 = set(fps[fps.doc_id == 1]["fp"])
    assert f0 & f1


def test_winnow_short_docs(ray_session):
    """len(norm) < k → no fingerprints; k ≤ len < k+w-1 → exactly one."""
    fps = winnow_fingerprints(_docs(["ab", "abcdefgh", ""])).to_pandas()
    assert set(fps["doc_id"]) == {1}
    assert len(fps[fps.doc_id == 1]) == 1


def test_winnow_edit_locality(ray_session):
    """A one-char edit far from a region leaves that region's fingerprints
    intact (the locality property that makes winnowing usable for overlap
    detection)."""
    base = "a" * 0 + "the winnowing algorithm selects the rightmost minimum hash in each window of consecutive kgram hashes"
    edited = base + " Z"
    fps = winnow_fingerprints(_docs([base, edited])).to_pandas()
    f0 = set(fps[fps.doc_id == 0]["fp"])
    f1 = set(fps[fps.doc_id == 1]["fp"])
    # all but the tail window's fingerprints survive the edit
    assert len(f0 & f1) >= len(f0) - 2


def test_winnow_overlap_vs_bruteforce(ray_session):
    """Pair overlap counts equal brute-force |fp-set ∩ fp-set| per pair."""
    from itertools import combinations

    from log_parser_ray.stages.sketch import winnow_overlap_pairs

    common = "the common boilerplate license header text shared by several documents"
    texts = [
        common + " alpha variant one with extra words",
        common + " beta variant two quite different tail",
        "entirely unrelated document about winnowing fingerprints and hashing",
        common + " gamma",
    ]
    ds = _docs(texts)
    fps = winnow_fingerprints(ds).to_pandas()
    sets = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    want = {
        (a, b): len(sets.get(a, set()) & sets.get(b, set()))
        for a, b in combinations(range(len(texts)), 2)
        if len(sets.get(a, set()) & sets.get(b, set())) >= 2
    }
    got = winnow_overlap_pairs(ds.repartition(3), min_shared=2)
    got_map = {(a, b): n for a, b, n in zip(got["a_id"], got["b_id"], got["n_shared"])}
    assert got_map == want
    # the three boilerplate-sharing docs all pair up
    assert {(0, 1), (0, 3), (1, 3)} <= set(got_map)


# ---------------------------------------------------------------------------
# deterministic sampling


def _keyed(n=2000):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array([f"src{i % 4}" for i in range(n)], pa.string()),
            }
        )
    )


def test_sample_rate_and_determinism(ray_session):
    ds = _keyed()
    a = sample_by_hash(ds, "doc_id", 6554).to_pandas()
    b = sample_by_hash(ds, "doc_id", 6554).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    # ~10% with binomial tolerance
    assert 120 <= len(a) <= 280


def test_sample_nesting(ray_session):
    """Smaller rate with the same salt selects a SUBSET (nested corpora)."""
    ds = _keyed()
    small = set(sample_by_hash(ds, "doc_id", 655).to_pandas()["doc_id"])
    big = set(sample_by_hash(ds, "doc_id", 6554).to_pandas()["doc_id"])
    assert small <= big


def test_sample_salt_independence(ray_session):
    """Different salts give (near-)independent subsets, not shifted copies."""
    ds = _keyed()
    a = set(sample_by_hash(ds, "doc_id", 6554, salt="sA").to_pandas()["doc_id"])
    b = set(sample_by_hash(ds, "doc_id", 6554, salt="sB").to_pandas()["doc_id"])
    assert a != b
    # overlap ≈ rate² · n = ~20; wildly smaller than either set
    assert len(a & b) < min(len(a), len(b)) / 2


def test_stratified_rates_and_default_drop(ray_session):
    ds = _keyed()
    out = stratified_sample(
        ds, "source", "doc_id", {"src0": 65536, "src1": 6554}
    ).to_pandas()
    by = out["source"].value_counts().to_dict()
    assert by.get("src0") == 500  # rate 1.0 keeps every row of the stratum
    assert 20 <= by.get("src1", 0) <= 130
    assert "src2" not in by and "src3" not in by  # default 0 drops


def test_stratified_consistent_with_uniform(ray_session):
    """Same salt+key hash → a stratum sampled at rate r contains exactly the
    uniform-rate-r rows of that stratum."""
    ds = _keyed()
    uni = set(sample_by_hash(ds, "doc_id", 6554).to_pandas()["doc_id"])
    st = stratified_sample(ds, "source", "doc_id", {"src2": 6554}).to_pandas()
    assert set(st["doc_id"]) == {d for d in uni if d % 4 == 2}


# ---------------------------------------------------------------------------
# heavy hitters


def test_mg_summary_bound():
    """MG invariant: undercount of any value ≤ dropped/(capacity+1)."""
    rng = np.random.RandomState(7)
    stream = rng.zipf(1.5, 5000).astype(str)
    vals, cnts = np.unique(stream, return_counts=True)
    cap = 8
    mg = _mg_summary(list(vals), [int(c) for c in cnts], cap)
    dropped = len(stream) - sum(mg.values())
    assert dropped % (cap + 1) == 0
    bound = dropped // (cap + 1)
    true = dict(zip(vals, cnts))
    for v, n in true.items():
        assert n - mg.get(v, 0) <= bound


def _term_ds(n=4000, skew=1.3, seed=3):
    rng = np.random.RandomState(seed)
    terms = [f"t{z}" for z in rng.zipf(skew, n)]
    return rd.from_arrow(pa.table({"term": pa.array(terms, pa.string())}))


@pytest.mark.parametrize("capacity", [4096, 3])
def test_heavy_hitters_exact_both_regimes(ray_session, capacity):
    """Certified path (big capacity) and fallback path (capacity=3) both
    return the exact brute-force top-k."""
    ds = _term_ds()
    got = heavy_hitters(ds.repartition(11), "term", 8, capacity=capacity)
    truth = (
        ds.to_pandas()["term"]
        .value_counts()
        .rename_axis("term")
        .reset_index(name="n")
        .sort_values(["n", "term"], ascending=[False, True], kind="stable")
        .head(8)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), truth.astype({"n": "int64"}))


def test_heavy_hitters_empty(ray_session):
    ds = rd.from_arrow(pa.table({"term": pa.array([], pa.string())}))
    out = heavy_hitters(ds, "term", 5)
    assert len(out) == 0
