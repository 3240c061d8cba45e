"""Aggregation toolkit vs a serial pandas oracle on small random tables."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from log_parser_ray.stages.aggregate import (
    distinct_count,
    grouped_count,
    grouped_stats,
    pivot_counts,
    threshold_alerts,
    top_k,
)


@pytest.fixture(scope="module")
def table():
    rng = np.random.RandomState(7)
    n = 5000
    return pd.DataFrame(
        {
            "k1": rng.choice(list("abcde"), n),
            "k2": rng.randint(0, 4, n),
            "v": rng.randint(0, 1000, n).astype("int64"),
            "u": rng.randint(0, 50, n),
        }
    )


def test_grouped_count(table):
    got = grouped_count(rd.from_pandas(table), ["k1", "k2"], alias="n").to_pandas()
    want = table.groupby(["k1", "k2"]).size().reset_index(name="n")
    got = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    want = want.sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), want.astype({"n": "int64"}))


def test_grouped_count_skew_single_hot_key():
    """A hot key (90% of rows) still aggregates exactly — the per-block partial
    bounds its shuffle contribution to one row per block."""
    df = pd.DataFrame({"k": ["hot"] * 9000 + ["c%d" % i for i in range(1000)]})
    ds = rd.from_pandas(df).repartition(16)
    got = grouped_count(ds, ["k"], alias="n").to_pandas()
    assert int(got.loc[got["k"] == "hot", "n"].iloc[0]) == 9000
    assert len(got) == 1001


def test_grouped_stats(table):
    got = grouped_stats(
        rd.from_pandas(table), ["k1"], "v", count="n", sum_="s", min_="mn", max_="mx"
    ).to_pandas().sort_values("k1").reset_index(drop=True)
    want = (
        table.groupby("k1")["v"]
        .agg(n="count", s="sum", mn="min", mx="max")
        .reset_index()
        .sort_values("k1")
        .reset_index(drop=True)
    )
    for c in ["n", "s", "mn", "mx"]:
        assert (got[c].astype("int64") == want[c].astype("int64")).all()


def test_distinct_count(table):
    got = distinct_count(rd.from_pandas(table), ["k1"], "u", alias="nd").to_pandas()
    want = table.groupby("k1")["u"].nunique().reset_index(name="nd")
    got = got.sort_values("k1").reset_index(drop=True)
    assert (got["nd"].astype("int64") == want["nd"].astype("int64")).all()


def test_distinct_count_global(table):
    got = distinct_count(rd.from_pandas(table), [], "u", alias="nd")
    assert int(got["nd"].iloc[0]) == table["u"].nunique()


def test_top_k_deterministic_ties():
    df = pd.DataFrame({"k": list("abcdef"), "n": [5, 5, 5, 3, 3, 1]})
    got = top_k(rd.from_pandas(df).repartition(3), ["n", "k"], [True, False], 4).to_pandas()
    assert list(got["k"]) == ["a", "b", "c", "d"]


def test_top_k_prune_matches_full_sort(table):
    ds = rd.from_pandas(table).repartition(8)
    a = top_k(ds, ["v", "k1"], [True, False], 15, prune_blocks=True).to_pandas()
    b = top_k(ds, ["v", "k1"], [True, False], 15, prune_blocks=False).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_pivot_zero_fill():
    counts = rd.from_pandas(
        pd.DataFrame({"r": ["x", "x", "y"], "c": ["a", "b", "a"], "n": [1, 2, 3]})
    )
    got = pivot_counts(counts, "r", "c", "n", ["a", "b", "z"]).to_pandas()
    got = got.sort_values("r").reset_index(drop=True)
    assert list(got.columns) == ["r", "a", "b", "z"]
    assert got.loc[0].tolist() == ["x", 1, 2, 0]
    assert got.loc[1].tolist() == ["y", 3, 0, 0]


def test_threshold_alerts():
    agg = pd.DataFrame({"k": ["a", "b"], "n": [10, 2]})
    out = threshold_alerts(agg, rule="r", key_col="k", value_col="n", threshold=5.0)
    assert list(out["key"]) == ["a"]
    assert out["value"].iloc[0] == 10.0


def test_sorted_combine_skewed_keys_exact():
    """The range-sort + per-block-combine shuffle must keep all rows of an
    equal key in one block — adversarial skew: 2 hot keys over many blocks."""
    import numpy as np

    rs = np.random.RandomState(0)
    n = 200_000
    df = pd.DataFrame(
        {"k1": rs.choice(["hot", "cold"], n, p=[0.98, 0.02]), "v": rs.randint(0, 100, n)}
    )
    ds = rd.from_pandas(df).repartition(16)
    got = grouped_stats(ds, ["k1"], "v", count="n", sum_="s").to_pandas()
    truth = df.groupby("k1").agg(n=("v", "count"), s=("v", "sum")).reset_index()
    got = got.sort_values("k1").reset_index(drop=True)
    truth = truth.sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth, check_dtype=False)


def test_grouped_count_high_cardinality_exact():
    import numpy as np

    rs = np.random.RandomState(1)
    n = 100_000
    df = pd.DataFrame({"k1": rs.randint(0, 30_000, n)})
    ds = rd.from_pandas(df).repartition(12)
    got = grouped_count(ds, ["k1"], alias="n").to_pandas()
    truth = df.groupby("k1").size().reset_index(name="n")
    got = got.sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth, check_dtype=False)


def test_group_safe_under_block_splits():
    """Force Ray's dynamic block splitting to cut sort partitions mid-key:
    with target_max_block_size tiny, a bare sort+per-block combine would emit
    duplicate key rows; group_safe_map must stay exact (ADVICE round 1)."""
    from ray.data import DataContext

    rs = np.random.RandomState(3)
    n = 60_000
    df = pd.DataFrame(
        {
            "k1": rs.choice(["a", "b", "hot", "zz"], n, p=[0.2, 0.2, 0.55, 0.05]),
            "v": rs.randint(0, 1000, n).astype("int64"),
        }
    )
    ctx = DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # ~16 KiB: every partition splits
    try:
        ds = rd.from_pandas(df).repartition(8)
        got = grouped_stats(ds, ["k1"], "v", count="n", sum_="s").to_pandas()
        # per-conversation pass under splitting too
        from log_parser_ray.stages.aggregate import group_safe_map

        def whole_groups(g: pd.DataFrame) -> pd.DataFrame:
            # one row per key with its full row count — duplicates appear if
            # a key group was ever split across batches
            return g.groupby("k1", as_index=False).size()

        parts = group_safe_map(ds, ["k1"], whole_groups, batch_format="pandas").to_pandas()
    finally:
        ctx.target_max_block_size = prev
    truth = df.groupby("k1").agg(n=("v", "count"), s=("v", "sum")).reset_index()
    got = got.sort_values("k1").reset_index(drop=True)
    truth = truth.sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth, check_dtype=False)
    # every key appears exactly once across all batches of the safe map
    parts = parts.sort_values("k1").reset_index(drop=True)
    assert list(parts["k1"]) == sorted(df["k1"].unique())
    assert parts.set_index("k1")["size"].to_dict() == df["k1"].value_counts().to_dict()


def test_grouped_quantiles_vs_numpy(table):
    import math

    from log_parser_ray.stages.aggregate import grouped_quantiles

    qs = [0.5, 0.9, 0.95, 0.99]
    got = (
        grouped_quantiles(rd.from_pandas(table), ["k1"], "v", qs)
        .to_pandas()
        .sort_values("k1")
        .reset_index(drop=True)
    )
    rows = []
    for k, g in table.groupby("k1"):
        v = np.sort(g["v"].to_numpy())
        row = {"k1": k, "n": len(v)}
        for q in qs:
            row[f"p{int(round(q * 100))}"] = v[min(max(math.ceil(q * len(v)), 1), len(v)) - 1]
        rows.append(row)
    want = pd.DataFrame(rows).sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_grouped_quantiles_under_block_splits(table):
    """Same answer when the input arrives as many tiny blocks."""
    from log_parser_ray.stages.aggregate import grouped_quantiles

    one = grouped_quantiles(rd.from_pandas(table), ["k1"], "v", [0.5, 0.95]).to_pandas()
    many = grouped_quantiles(
        rd.from_pandas(table).repartition(37), ["k1"], "v", [0.5, 0.95]
    ).to_pandas()
    one = one.sort_values("k1").reset_index(drop=True)
    many = many.sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


# --- merge_join: the engine's distributed sort-merge join ---------------


@pytest.fixture(scope="module")
def join_sides():
    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 60, 400).astype("int64"),
            "lv": rng.randint(0, 1000, 400).astype("int64"),
        }
    )
    # right: unique keys 30..89 (half overlap), with a payload
    right = pd.DataFrame(
        {
            "k": np.arange(30, 90, dtype="int64"),
            "rv": np.arange(30, 90, dtype="int64") * 10,
        }
    )
    return left, right


@pytest.mark.parametrize("how,pd_how", [
    ("inner", "inner"), ("left_outer", "left"),
])
def test_merge_join_matches_pandas(ray_session, join_sides, how, pd_how):
    import pyarrow as pa

    from log_parser_ray.stages.aggregate import merge_join

    left, right = join_sides
    got = (
        merge_join(
            rd.from_pandas(left).repartition(13),
            rd.from_pandas(right).repartition(5),
            on="k", how=how,
            left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how=pd_how)
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["lv"].tolist() == want["lv"].tolist()
    # left_outer: misses are null on the right payload
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_merge_join_semi_anti(ray_session, join_sides, how):
    import pyarrow as pa

    from log_parser_ray.stages.aggregate import merge_join

    left, right = join_sides
    got = (
        merge_join(
            rd.from_pandas(left).repartition(7),
            rd.from_pandas(right),
            on="k", how=how,
            left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    mask = left["k"].isin(right["k"])
    want = (
        left[mask if how == "left_semi" else ~mask]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_merge_join_multikey_and_right_on(ray_session):
    """Composite keys + differing right-side key names; key order in the
    output follows the LEFT names."""
    import pyarrow as pa

    from log_parser_ray.stages.aggregate import merge_join

    left = pd.DataFrame(
        {"a": ["x", "x", "y", "z"], "b": [1, 2, 1, 9], "lv": [10, 20, 30, 40]}
    )
    right = pd.DataFrame(
        {"ra": ["x", "y", "y"], "rb": [2, 1, 3], "rv": [200, 100, 300]}
    )
    got = (
        merge_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on=("a", "b"), right_on=("ra", "rb"), how="inner",
            left_schema=pa.schema(
                [("a", pa.string()), ("b", pa.int64()), ("lv", pa.int64())]
            ),
            right_schema=pa.schema(
                [("ra", pa.string()), ("rb", pa.int64()), ("rv", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == {
        "a": ["x", "y"], "b": [2, 1], "lv": [20, 30], "rv": [200, 100]
    }


def test_merge_join_empty_sides(ray_session):
    import pyarrow as pa

    from log_parser_ray.stages.aggregate import merge_join

    left = pd.DataFrame({"k": pd.array([], dtype="int64"),
                         "lv": pd.array([], dtype="int64")})
    right = pd.DataFrame({"k": [1, 2], "rv": [10, 20]})
    out = merge_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="inner",
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas()
    assert len(out) == 0
    # non-empty left joined against an empty right: left_outer keeps rows
    out2 = merge_join(
        rd.from_pandas(right.rename(columns={"rv": "lv"})),
        rd.from_pandas(left.rename(columns={"lv": "rv"})),
        on="k", how="left_outer",
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas()
    assert len(out2) == 2 and out2["rv"].isna().all()


def test_with_group_size_window_count(ray_session):
    from log_parser_ray.stages.aggregate import with_group_size

    df = pd.DataFrame({"g": ["a", "a", "b", "c", "c", "c"],
                       "v": [1, 2, 3, 4, 5, 6]})
    out = (
        with_group_size(rd.from_pandas(df).repartition(4), ["g"], alias="n")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 2, 1, 3, 3, 3]
    assert out["v"].tolist() == [1, 2, 3, 4, 5, 6]  # every row kept
