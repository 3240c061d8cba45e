"""NDJSON source/sink: mixed plain + .gz shard reads are lossless vs the
parquet original, the explicit schema pins dtypes and drops stray fields,
and write_jsonl output reads back row-identical."""

from __future__ import annotations

import gzip
import json

import pyarrow as pa
import pyarrow.parquet as pq

from log_parser_ray.sources.jsonl import (
    export_documents_jsonl,
    read_documents_jsonl,
    write_jsonl,
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


def test_jsonl_roundtrip_lossless(ray_session, tmp_path):
    out = export_documents_jsonl(SF, str(tmp_path / "jl"), shards=4)
    got = (
        read_documents_jsonl(out, schema=DOC_SCHEMA)
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
    assert got.equals(want[got.columns.tolist()])
    # both compressions actually participated
    names = {p.name for p in (tmp_path / "jl").iterdir()}
    assert any(n.endswith(".jsonl") for n in names)
    assert any(n.endswith(".jsonl.gz") for n in names)


def test_jsonl_schema_pins_dtypes_and_ignores_stray_fields(
    ray_session, tmp_path
):
    # shard 0: a stray field the schema doesn't list; shard 1 (.gz): lang
    # all-null — without explicit_schema per-shard inference would type it
    # null and the union would fail or widen unpredictably
    rows0 = [
        {"doc_id": 1, "text": "a b", "lang": "en", "source": "s",
         "n_chars": 3, "stray": True},
    ]
    rows1 = [
        {"doc_id": 2, "text": "c", "lang": None, "source": "s", "n_chars": 1},
    ]
    (tmp_path / "p0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows0) + "\n"
    )
    (tmp_path / "p1.jsonl.gz").write_bytes(
        gzip.compress(
            ("\n".join(json.dumps(r) for r in rows1) + "\n").encode()
        )
    )
    ds = read_documents_jsonl(str(tmp_path), schema=DOC_SCHEMA)
    assert ds.schema().base_schema == DOC_SCHEMA
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert "stray" not in df.columns
    assert df["lang"].tolist() == ["en", None]
    assert df["n_chars"].tolist() == [3, 1]


def test_cli_jsonl_to_parquet(ray_session, tmp_path, capsys):
    """--jsonl-in bulk-converts NDJSON shards to parquet under --out (the
    once-at-the-edge step)."""
    from log_parser_ray.__main__ import main

    export_documents_jsonl(SF, str(tmp_path / "in"), shards=4)
    assert main(["--jsonl-in", str(tmp_path / "in"),
                 "--out", str(tmp_path / "out")]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    import ray

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
    # rerun REPLACES the run-owned sink — uuid part names must not accumulate
    assert main(["--jsonl-in", str(tmp_path / "in"),
                 "--out", str(tmp_path / "out")]) == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["rows"] == res["rows"]
    assert ray.data.read_parquet(res["out"]).count() == res["rows"]


def test_write_jsonl_reads_back(ray_session, tmp_path):
    import ray

    src = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = write_jsonl(src, str(tmp_path / "sink"))
    back = (
        read_documents_jsonl(out)  # the sink's .json shards roundtrip
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back[want.columns.tolist()].equals(want)
