"""Raw text-log source — the reference's actual input format.

The reference consumes plain/gzipped text logs discovered by filename date
patterns (IO1: `find | egrep`, websphereLogParser.sh:92-93; IO2:
unzip/gunzip, websphereLogParser.sh:107-114; IO3: server name from the file
path, websphereLogParser.sh:120-121). Ray-native shape: ``read_binary_files``
— ONE ROW PER FILE, the reference's own unit of work — then a vectorized
in-task decompress + line split producing the transcript schema:

    conv_id  = file stem (the source/server identity, IO3)
    turn_idx = line number within the file (the file order the reference's
               state machines depend on — exact because one task owns the
               whole file; a task-local running counter over split blocks
               would misnumber lines)
    role     = "log", tool = null
    text     = the raw line
    ts       = extracted per line from `[DD/Mon/YYYY:HH:MM:SS -ZZZZ]`
               (access-log, webAccessLogParser.sh:299-320) or
               `[M/D/YY H:MM:SS:mmm TZ]` (WAS SystemOut,
               websphereLogParser.sh:205-213); unmatched lines get epoch 0,
               so hourly buckets and windows are real on the reference's
               native input

so every downstream stage — parse, route, aggregate, sessions — runs
unchanged on real log files. Parallelism = number of files (logs arrive as
per-server daily rotations, so this matches the corpus shape; a single
monster file would call for a byte-range split with line-boundary fixup).
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

import ray.data


# Localized month tokens → the English %b set. The reference's date
# derivation is LC_ALL-dependent (`date +%b`, usage.sh:137-157), so a
# non-English host writes localized month abbreviations into filenames and
# timestamps; Arrow's strptime knows only the C-locale names. This table is
# the user-extension surface (SURVEY §2.10) for whatever locale the logs
# carry — keys lowercase, only tokens that DIFFER from English needed.
MONTH_TOKENS: dict[str, str] = {
    # German
    "mär": "Mar", "mrz": "Mar", "okt": "Oct", "dez": "Dec",
    # French
    "févr": "Feb", "avr": "Apr", "mai": "May", "juin": "Jun",
    "juil": "Jul", "août": "Aug", "déc": "Dec",
    # Spanish
    "ene": "Jan", "abr": "Apr", "ago": "Aug", "dic": "Dec",
}


def normalize_month_tokens(dtm: pa.Array | pa.ChunkedArray):
    """`DD/<mon>/YYYY:…` stamps: translate a localized month token to the
    English %b name so strptime accepts it. The translate runs over the
    DICTIONARY of unique month tokens (≤ tens), not rows, and returns the
    input unchanged (zero-copy) when every token is already English — the
    common case costs one regex pass + a tiny dict encode."""
    import pyarrow.compute as pc

    ex = pc.extract_regex(dtm, r"^(?P<d>\d{1,2}/)(?P<m>[^/]+)(?P<r>/.*)$")
    mon = pc.struct_field(ex, "m")
    arr = mon.combine_chunks() if isinstance(mon, pa.ChunkedArray) else mon
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    mapped = [MONTH_TOKENS.get((u or "").lower(), u) for u in uniq]
    if mapped == uniq:
        return dtm
    norm = pa.Array.from_pandas(mapped, type=pa.string()).take(enc.indices)
    rebuilt = pc.binary_join_element_wise(
        pc.struct_field(ex, "d"), norm, pc.struct_field(ex, "r"), ""
    )
    return pc.if_else(pc.is_valid(mon), rebuilt, dtm)


def extract_line_ts(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized per-line timestamp extraction (M5 analogue).

    Two grammars, tried in order with RE2 kernels:
      access-log `[13/Jun/2015:10:32:04 -0400]` (webAccessLogParser.sh:299,
        mktime at :320) — parsed with %d/%b/%Y:%H:%M:%S; localized month
        tokens (usage.sh:137-157's LC_ALL-dependent %b) normalize via
        MONTH_TOKENS first,
      WAS SystemOut `[6/13/15 10:32:04:123 EDT]` (websphereLogParser.sh:205)
        — parsed with %m/%d/%y %H:%M:%S.
    The reference treats times as wall-clock local; zone offsets are kept as
    text columns there, so both parses ignore the zone token and unmatched
    lines fall back to epoch 0 (never null — downstream hour derivation
    stays total)."""
    import pyarrow.compute as pc

    acc = pc.extract_regex(
        text, r"\[(?P<a>\d{2}/[^/ \]]{3,6}/\d{4}:\d{2}:\d{2}:\d{2}) [-+]\d{4}\]"
    )
    was = pc.extract_regex(
        text, r"\[(?P<w>\d{1,2}/\d{1,2}/\d{2} \d{1,2}:\d{2}:\d{2}):\d{3}"
    )
    a_ts = pc.strptime(
        normalize_month_tokens(pc.struct_field(acc, "a")),
        format="%d/%b/%Y:%H:%M:%S", unit="us",
        error_is_null=True,
    )
    w_ts = pc.strptime(
        pc.struct_field(was, "w"), format="%m/%d/%y %H:%M:%S", unit="us",
        error_is_null=True,
    )
    epoch0 = pa.scalar(0, pa.timestamp("us"))
    return pc.coalesce(a_ts, w_ts, epoch0)


def _stem(path: str) -> str:
    stem = os.path.basename(path)
    for ext in (".gz", ".zip", ".log", ".txt"):
        if stem.endswith(ext):
            stem = stem[: -len(ext)]
    return stem


def read_raw_logs(paths, *, file_pattern: str | None = None) -> "ray.data.Dataset":
    """Text/gz log files (or dirs of them) → transcript-schema Dataset.

    ``file_pattern``: optional substring filter on file names — the IO1
    date-predicate analogue (`find ... access_log.MMDDYY`)."""
    if isinstance(paths, str):
        paths = [paths]
    files = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if file_pattern is None or file_pattern in name:
                    files.append(os.path.join(p, name))
        elif file_pattern is None or file_pattern in os.path.basename(p):
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no log files matched under {paths}")

    raw = ray.data.read_binary_files(files, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        convs, turns, texts = [], [], []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            if payload[:2] == b"\x1f\x8b":
                # magic-byte check, not extension: the reader already
                # decompresses .gz it recognizes
                payload = gzip.decompress(payload)
            elif payload[:4] == b"PK\x03\x04":
                # .zip (the reference's WAS rotation format,
                # websphereLogParser.sh:107-114: `unzip -p`): concatenate
                # members in ARCHIVE (central-directory) order — the order
                # unzip -p streams them, which can differ from name order
                import io
                import zipfile

                with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                    payload = b"".join(
                        zf.read(info) for info in zf.infolist()
                        if not info.filename.endswith("/")
                    )
            lines = payload.decode("utf-8", errors="replace").splitlines()
            stem = _stem(path)
            convs.extend([stem] * len(lines))
            turns.append(np.arange(len(lines), dtype=np.int32))
            texts.extend(lines)
        n = len(texts)
        text_arr = pa.array(texts, pa.string())
        return pa.table(
            {
                "conv_id": pa.array(convs, pa.string()),
                "turn_idx": pa.array(
                    np.concatenate(turns) if turns else np.array([], np.int32)
                ),
                "role": pa.array(["log"] * n, pa.string()),
                "text": text_arr,
                "tool": pa.nulls(n, pa.string()),
                "ts": extract_line_ts(text_arr),
            }
        )

    return raw.map_batches(explode, batch_format="pyarrow", batch_size=None)
