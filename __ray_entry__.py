"""Driver contract for the Ray-Data-native log/transcript pipeline engine.

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline at
sf0.001.  ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 over the shared test tables; ``oracle_sql()`` gives the
DuckDB-equivalent SQL (same column names, same values).

The transcript table (BASELINE.json input_hint shape) is derived
deterministically from the ``events`` table by
``log_parser_ray.sources.transcripts`` — the SQL CTE there is the exact same
derivation, so the full pipeline is oracle-checkable end to end.

Ray is initialised by the driver before importing this module; nothing here
calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow.compute as pc

import ray.data

from log_parser_ray.schema import SINKS, THRESHOLDS
from log_parser_ray.sources.transcripts import (
    TRANSCRIPTS_CTE,
    transcripts_from_events,
)
from log_parser_ray.stages.aggregate import (
    distinct_count,
    grouped_count,
    grouped_stats,
    pivot_counts,
    threshold_alerts,
    top_k,
)
from log_parser_ray.stages.enrich import enrich_dataset, enrich_sql_cte
from log_parser_ray.stages.parse import parse_dataset, parsed_sql_cte
from log_parser_ray.stages import sessions as sess

# ---------------------------------------------------------------------------
# shared builders

_SQL_PREFIX = (
    f"WITH {TRANSCRIPTS_CTE},\n{parsed_sql_cte()},\n{enrich_sql_cte()}\n"
)


def _transcripts(sf_dir: str) -> "ray.data.Dataset":
    return transcripts_from_events(sf_dir)


def _parsed(sf_dir: str) -> "ray.data.Dataset":
    return parse_dataset(_transcripts(sf_dir))


def _enriched(sf_dir: str) -> "ray.data.Dataset":
    return enrich_dataset(_parsed(sf_dir), concurrency=4)


def _keep(ds, col):
    """Vectorized IS NOT NULL filter."""
    return ds.map_batches(
        lambda t, c=col: t.filter(pc.is_valid(t[c])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _only_sink(ds, sink):
    return ds.map_batches(
        lambda t, s=sink: t.filter(pc.equal(t["sink"], s)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# queries — transcripts / log-pipeline family


def q_routed_rows(sf_dir: str):
    """IO4/IO7 routed-row equality gate: the full parsed+enriched table."""
    return _enriched(sf_dir)


def q_sink_counts(sf_dir: str):
    return grouped_count(_enriched(sf_dir), ["sink"], alias="n")


def q_conv_category_counts(sf_dir: str):
    """North rule: groupby(conv_id, category).count()."""
    return grouped_count(_enriched(sf_dir), ["conv_id", "category"], alias="n")


def q_severity_counts(sf_dir: str):
    return grouped_count(_parsed(sf_dir), ["severity"], alias="n")


def q_error_code_counts(sf_dir: str):
    ds = _keep(_parsed(sf_dir), "error_code")
    return grouped_count(ds, ["error_code", "severity"], alias="n")


def q_hourly_sink_counts(sf_dir: str):
    return grouped_count(_parsed(sf_dir), ["hour", "sink"], alias="n")


def q_hourly_distinct_convs(sf_dir: str):
    return distinct_count(_parsed(sf_dir), ["hour"], "conv_id", alias="n_convs")


def q_rt_bucket_counts(sf_dir: str):
    return grouped_count(_keep(_parsed(sf_dir), "rt_bucket"), ["rt_bucket"], alias="n")


def q_tool_rt_stats(sf_dir: str):
    ds = _keep(_parsed(sf_dir), "tool_name")
    return grouped_stats(
        ds, ["tool_name"], "rt_us",
        count="n", sum_="sum_rt_us", min_="min_rt_us", max_="max_rt_us",
    )


def q_topk_slowest_tools(sf_dir: str):
    ds = _keep(_parsed(sf_dir), "rt_us").select_columns(
        ["conv_id", "turn_idx", "tool_name", "rt_us"]
    )
    return top_k(ds, by=["rt_us", "conv_id", "turn_idx"],
                 descending=[True, False, False], k=10)


def q_topk_error_codes(sf_dir: str):
    counts = grouped_count(_keep(_parsed(sf_dir), "error_code"), ["error_code"], alias="n")
    return top_k(counts, by=["n", "error_code"], descending=[True, False], k=10)


def q_category_counts(sf_dir: str):
    return grouped_count(_enriched(sf_dir), ["category"], alias="n")


def q_conv_error_alerts(sf_dir: str):
    """J5 threshold alert join: conv error-sink count vs thresholds table."""
    th = THRESHOLDS["conv.errCntTh"]
    errs = grouped_count(
        _only_sink(_parsed(sf_dir), "errors"), ["conv_id"], alias="n"
    ).to_pandas()
    return threshold_alerts(errs, rule="conv.errCntTh", key_col="conv_id",
                            value_col="n", threshold=th)


def q_hour_sink_pivot(sf_dir: str):
    """AG6 pivot to a fixed wide schema with zero-fill."""
    counts = grouped_count(_parsed(sf_dir), ["hour", "sink"], alias="n")
    out = pivot_counts(counts, "hour", "sink", "n", SINKS)
    return out


def q_sink_pct(sf_dir: str):
    """AG5 percentage-of-total; percentages are exact rationals of counts so
    the round(4) is drift-free."""
    df = grouped_count(_parsed(sf_dir), ["sink"], alias="n").to_pandas()
    total = int(df["n"].sum())
    df["pct"] = (100.0 * df["n"] / total).round(4)
    return df


def q_session_durations(sf_dir: str):
    """J4 login→logout pairing per conversation (ordered map_groups)."""
    out = sess.session_pairs(_parsed(sf_dir))
    return out


def q_asof_error_tool(sf_dir: str):
    """J2 as-of correlation: each error turn joined to the most recent prior
    tool turn of the same conversation."""
    return sess.asof_correlate(_parsed(sf_dir))


def q_last_turn_per_conv(sf_dir: str):
    return sess.last_per_conv(_parsed(sf_dir))


def q_canonical_error_counts(sf_dir: str):
    """M21 message canonicalization before counting."""
    def canon(t):
        c = pc.replace_substring_regex(
            t["text"], r"thread hung for \d+ ms", "thread hung for N ms"
        )
        return t.append_column("canonical", c)

    ds = _keep(_parsed(sf_dir), "error_code").map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_count(ds, ["canonical", "severity"], alias="n")


def q_grand_totals(sf_dir: str):
    """AG7 grand totals in one pass."""
    parsed = _parsed(sf_dir)

    def partial(t):
        import pyarrow as pa
        return pa.table({
            "rows": [t.num_rows],
            "n_errors": [pc.sum(pc.cast(pc.is_valid(t["error_code"]), pa.int64())).as_py() or 0],
            "n_filtered": [pc.sum(pc.cast(t["filtered"], pa.int64())).as_py() or 0],
        })

    parts = parsed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    nconvs = distinct_count(parsed, [], "conv_id", alias="n_convs")  # pandas 1-row
    return pd.DataFrame({
        "n_rows": [int(parts["rows"].sum())],
        "n_convs": [int(nconvs["n_convs"].iloc[0])],
        "n_errors": [int(parts["n_errors"].sum())],
        "n_filtered": [int(parts["n_filtered"].sum())],
    })


# ---------------------------------------------------------------------------
# events-direct + TPC-H-ish family (same aggregate toolkit over other tables)


def q_events_value_stats(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = grouped_stats(ds, ["event_type"], "value",
                        count="n", sum_="sum_value", min_="min_value", max_="max_value")
    df = out.to_pandas()
    # sums of 2-decimal values: scale to integer hundredths (drift-free)
    df["sum_value"] = np.round(df["sum_value"] * 100).astype("int64")
    return df


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1 shape over lineitem; money emitted as integer cents so
    parallel summation order cannot change the result."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def derive(t):
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pc.cast(1.0, "double"), t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    q = grouped_stats(ds, ["l_returnflag", "l_linestatus"], "l_quantity",
                      count="n", sum_="sum_qty").to_pandas()
    p = grouped_stats(ds, ["l_returnflag", "l_linestatus"], "disc_price",
                      count=None, sum_="sum_disc_price").to_pandas()
    df = q.merge(p, on=["l_returnflag", "l_linestatus"])
    df["sum_qty"] = np.round(df["sum_qty"]).astype("int64")
    df["sum_disc_price"] = np.round(df["sum_disc_price"] * 100).astype("int64")
    return df


def q_top_customers(sf_dir: str):
    """Broadcast small-side join (J1 shape): per-customer order totals,
    customer dimension looked up from a broadcast dict, top 10."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    totals = grouped_stats(orders, ["o_custkey"], "o_totalprice",
                           count="n_orders", sum_="total").to_pandas()
    totals["total_cents"] = np.round(totals["total"] * 100).astype("int64")
    totals = totals.drop(columns=["total"])
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    name_col = "c_name" if "c_name" in cust.columns else cust.columns[1]
    lookup = dict(zip(cust["c_custkey"], cust[name_col]))
    totals["c_name"] = totals["o_custkey"].map(lookup)
    totals = totals.sort_values(
        ["total_cents", "o_custkey"], ascending=[False, True]
    ).head(10).reset_index(drop=True)
    return totals


# ---------------------------------------------------------------------------
# registry


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from log_parser_ray.pipelines import flagship

    res = flagship.run(_transcripts("/root/testdata/sf0.001"), enrich_concurrency=2)
    return res["conv_category"]


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "routed_rows": q_routed_rows,
        "sink_counts": q_sink_counts,
        "conv_category_counts": q_conv_category_counts,
        "severity_counts": q_severity_counts,
        "error_code_counts": q_error_code_counts,
        "hourly_sink_counts": q_hourly_sink_counts,
        "hourly_distinct_convs": q_hourly_distinct_convs,
        "rt_bucket_counts": q_rt_bucket_counts,
        "tool_rt_stats": q_tool_rt_stats,
        "topk_slowest_tools": q_topk_slowest_tools,
        "topk_error_codes": q_topk_error_codes,
        "category_counts": q_category_counts,
        "conv_error_alerts": q_conv_error_alerts,
        "hour_sink_pivot": q_hour_sink_pivot,
        "sink_pct": q_sink_pct,
        "session_durations": q_session_durations,
        "asof_error_tool": q_asof_error_tool,
        "last_turn_per_conv": q_last_turn_per_conv,
        "canonical_error_counts": q_canonical_error_counts,
        "grand_totals": q_grand_totals,
        "events_value_stats": q_events_value_stats,
        "lineitem_pricing": q_lineitem_pricing,
        "top_customers": q_top_customers,
    }


def oracle_sql() -> dict[str, str]:
    P = _SQL_PREFIX
    th = THRESHOLDS["conv.errCntTh"]
    pivot_cols = ", ".join(
        f"CAST(SUM(CASE WHEN sink = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {s}"
        for s in SINKS
    )
    return {
        "routed_rows": P + "SELECT * FROM enriched",
        "sink_counts": P + "SELECT sink, COUNT(*) AS n FROM enriched GROUP BY sink",
        "conv_category_counts": P
        + "SELECT conv_id, category, COUNT(*) AS n FROM enriched GROUP BY conv_id, category",
        "severity_counts": P + "SELECT severity, COUNT(*) AS n FROM parsed GROUP BY severity",
        "error_code_counts": P
        + "SELECT error_code, severity, COUNT(*) AS n FROM parsed WHERE error_code IS NOT NULL GROUP BY error_code, severity",
        "hourly_sink_counts": P
        + "SELECT hour, sink, COUNT(*) AS n FROM parsed GROUP BY hour, sink",
        "hourly_distinct_convs": P
        + "SELECT hour, COUNT(DISTINCT conv_id) AS n_convs FROM parsed GROUP BY hour",
        "rt_bucket_counts": P
        + "SELECT rt_bucket, COUNT(*) AS n FROM parsed WHERE rt_bucket IS NOT NULL GROUP BY rt_bucket",
        "tool_rt_stats": P
        + """SELECT tool_name, COUNT(rt_us) AS n, SUM(rt_us) AS sum_rt_us,
                    MIN(rt_us) AS min_rt_us, MAX(rt_us) AS max_rt_us
             FROM parsed WHERE tool_name IS NOT NULL GROUP BY tool_name""",
        "topk_slowest_tools": P
        + """SELECT conv_id, turn_idx, tool_name, rt_us FROM parsed
             WHERE rt_us IS NOT NULL
             ORDER BY rt_us DESC, conv_id, turn_idx LIMIT 10""",
        "topk_error_codes": P
        + """SELECT error_code, n FROM (
               SELECT error_code, COUNT(*) AS n FROM parsed
               WHERE error_code IS NOT NULL GROUP BY error_code)
             ORDER BY n DESC, error_code LIMIT 10""",
        "category_counts": P
        + "SELECT category, COUNT(*) AS n FROM enriched GROUP BY category",
        "conv_error_alerts": P
        + f"""SELECT 'conv.errCntTh' AS rule, conv_id AS key,
                     CAST(n AS DOUBLE) AS value, {th} AS threshold
              FROM (SELECT conv_id, COUNT(*) AS n FROM parsed
                    WHERE sink = 'errors' GROUP BY conv_id)
              WHERE n > {th}""",
        "hour_sink_pivot": P
        + f"SELECT hour, {pivot_cols} FROM parsed GROUP BY hour",
        "sink_pct": P
        + """SELECT sink, COUNT(*) AS n,
                    round(100.0 * COUNT(*) / (SELECT COUNT(*) FROM parsed), 4) AS pct
             FROM parsed GROUP BY sink""",
        "session_durations": P
        + """SELECT conv_id,
                    CAST(COUNT(login_uid) AS BIGINT) AS n_logins,
                    CAST(SUM(CASE WHEN is_logout THEN 1 ELSE 0 END) AS BIGINT) AS n_logouts,
                    arg_min(ts, turn_idx) FILTER (WHERE login_uid IS NOT NULL) AS login_ts,
                    arg_max(ts, turn_idx) FILTER (WHERE is_logout) AS logout_ts,
                    CASE WHEN arg_min(ts, turn_idx) FILTER (WHERE login_uid IS NOT NULL) IS NOT NULL
                          AND arg_max(ts, turn_idx) FILTER (WHERE is_logout) IS NOT NULL
                          AND arg_max(ts, turn_idx) FILTER (WHERE is_logout)
                              >= arg_min(ts, turn_idx) FILTER (WHERE login_uid IS NOT NULL)
                         THEN epoch_us(arg_max(ts, turn_idx) FILTER (WHERE is_logout))
                              - epoch_us(arg_min(ts, turn_idx) FILTER (WHERE login_uid IS NOT NULL))
                         ELSE NULL END AS duration_us
             FROM parsed GROUP BY conv_id""",
        "asof_error_tool": P
        + """SELECT conv_id, turn_idx, error_code,
                    CAST(prior_tool_turn AS BIGINT) AS prior_tool_turn, prior_tool_name
             FROM (
               SELECT conv_id, turn_idx, error_code,
                      lag(CASE WHEN tool_name IS NOT NULL THEN turn_idx END IGNORE NULLS)
                        OVER w AS prior_tool_turn,
                      lag(tool_name IGNORE NULLS) OVER w AS prior_tool_name
               FROM parsed
               WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
             ) WHERE error_code IS NOT NULL""",
        "last_turn_per_conv": P
        + """SELECT conv_id, turn_idx, role, sink FROM parsed
             QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) = 1""",
        "canonical_error_counts": P
        + """SELECT regexp_replace(text, 'thread hung for \\d+ ms', 'thread hung for N ms')
                      AS canonical,
                    severity, COUNT(*) AS n
             FROM parsed WHERE error_code IS NOT NULL GROUP BY 1, 2""",
        "grand_totals": P
        + """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT conv_id) AS n_convs,
                    COUNT(error_code) AS n_errors,
                    CAST(SUM(CASE WHEN filtered THEN 1 ELSE 0 END) AS BIGINT) AS n_filtered
             FROM parsed""",
        "events_value_stats": """
            SELECT event_type, COUNT(value) AS n,
                   CAST(round(SUM(value) * 100) AS BIGINT) AS sum_value,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY event_type""",
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus, COUNT(l_quantity) AS n,
                   CAST(round(SUM(l_quantity)) AS BIGINT) AS sum_qty,
                   CAST(round(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                     AS sum_disc_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
            SELECT o_custkey, COUNT(o_totalprice) AS n_orders,
                   CAST(round(SUM(o_totalprice) * 100) AS BIGINT) AS total_cents,
                   MAX(c_name) AS c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey
            ORDER BY total_cents DESC, o_custkey LIMIT 10""",
    }
