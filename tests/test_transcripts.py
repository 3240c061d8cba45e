"""The transcript shim and its SQL CTE must stay in lockstep row-by-row —
every oracle_sql() comparison rests on this equality."""

from __future__ import annotations

import duckdb
import pandas as pd

from log_parser_ray.sources.transcripts import TRANSCRIPTS_CTE, transcripts_from_events


def test_transcripts_match_sql_cte(ray_session, sf_dir):
    got = (
        transcripts_from_events(sf_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.execute(
        f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts ORDER BY conv_id, turn_idx"
    ).df()
    got["ts"] = got["ts"].astype("datetime64[us]")
    want["ts"] = want["ts"].astype("datetime64[us]")
    want["turn_idx"] = want["turn_idx"].astype("int32")
    pd.testing.assert_frame_equal(got, want)
