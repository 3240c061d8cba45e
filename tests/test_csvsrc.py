"""CSV/TSV source/sink: mixed plain + .gz shard reads are lossless vs the
parquet original, column pruning happens at the parse, TSV delimiters and
quoted embedded newlines survive, and write_csv output reads back
row-identical."""

from __future__ import annotations

import gzip
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from log_parser_ray.sources.csvsrc import (
    export_documents_csv,
    read_documents_csv,
    write_csv,
)

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def test_csv_roundtrip_lossless(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    export_documents_csv(SF, out)
    names = sorted(os.listdir(out))
    assert any(n.endswith(".csv") for n in names)
    assert any(n.endswith(".csv.gz") for n in names)
    got = (
        read_documents_csv(out, schema=DOC_SCHEMA)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(f"{SF}/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_csv_parse_time_pruning(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    export_documents_csv(SF, out)
    ds = read_documents_csv(
        out, schema=DOC_SCHEMA, columns=["doc_id", "lang"]
    )
    df = ds.to_pandas()
    assert sorted(df.columns) == ["doc_id", "lang"]
    assert len(df) == pq.read_metadata(f"{SF}/documents.parquet").num_rows


def test_tsv_and_quoted_newlines(ray_session, tmp_path):
    """TSV delimiter + a quoted value containing an embedded newline and
    the delimiter itself parse back exactly."""
    p = tmp_path / "x.tsv"
    tricky = 'line one\nline "two"\twith tab'
    pd.DataFrame({"doc_id": [1, 2], "text": [tricky, "plain"]}).to_csv(
        p, sep="\t", index=False
    )
    got = (
        read_documents_csv(
            str(p),
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
            delimiter="\t",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == [tricky, "plain"]


def test_write_csv_reads_back(ray_session, tmp_path):
    import ray.data

    t = pa.table(
        {"doc_id": pa.array([3, 1, 2], pa.int64()),
         "lang": ["en", "fr", "en"]}
    )
    out = str(tmp_path / "w")
    write_csv(ray.data.from_arrow(t), out)
    got = (
        read_documents_csv(
            out, schema=pa.schema([("doc_id", pa.int64()),
                                   ("lang", pa.string())])
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["lang"].tolist() == ["fr", "en", "en"]


def test_gz_shard_actually_compressed(tmp_path):
    out = str(tmp_path / "shards")
    export_documents_csv(SF, out)
    gz = [n for n in os.listdir(out) if n.endswith(".gz")][0]
    with gzip.open(os.path.join(out, gz), "rt", encoding="utf-8") as f:
        header = f.readline()
    assert "doc_id" in header


def test_cli_csv_to_parquet(ray_session, tmp_path, capsys):
    """--csv-in bulk-converts CSV shards to parquet under --out; rerun
    REPLACES the run-owned sink."""
    import json

    import ray.data

    from log_parser_ray.__main__ import main

    export_documents_csv(SF, str(tmp_path / "in"), shards=4)
    assert main(["--csv-in", str(tmp_path / "in"),
                 "--out", str(tmp_path / "out")]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = ray.data.read_parquet(f"{SF}/documents.parquet")
    assert res["rows"] == want.count()
    got = (
        ray.data.read_parquet(res["out"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    wdf = want.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got[wdf.columns.tolist()].equals(wdf)
    assert main(["--csv-in", str(tmp_path / "in"),
                 "--out", str(tmp_path / "out")]) == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["rows"] == res["rows"]
    assert ray.data.read_parquet(res["out"]).count() == res["rows"]
