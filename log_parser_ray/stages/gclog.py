"""Java verbose-GC parse pack (M17–M19, M20, A20/A21 of SURVEY.md §2).

The reference's javaGCStatsParser.sh tokenizes HotSpot -PrintGCDetails
records per generation segment — `used->used(total)` triples with K/B/M/G
unit suffixes — normalizes every size to KB (javaGCStatsParser.sh:285-403),
derives diff = before−after and pctAfter = after/total×100 per generation
(:406-445), and aggregates per (jvm, date) × gcType count + real-time sums
(:455-473,511-541) plus threshold exceed-counts after full GCs (:474-489).

Here: one named-group RE2 regex per record, vectorized unit normalization
via nested if_else, exact integer-KB arithmetic, pct as round-half-even 4dp
(matching the oracle's round_even).

Synthesis grammar per event (eid = event_id, uidn = user_id):
  jvm    'jvm' || uidn%4
  type   eid%5==0 → 'Full GC' (ParOldGen segment) else 'GC' (PSYoungGen)
  unit   eid%3 → K | M | G (normalization: K×1, M×1024, G×1048576)
  before = eid%10000 + 16     after = eid%3000 + 8    total = 16384
  pause  = '0.' || 7-digit fraction from eid → seconds string; parsed to µs
  line   '[<type> [<seg>: <b><u>-><a><u>(<t><u>)] 0.<frac> secs]'
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

GC_RE = (
    r"^(?P<jvm>\S+) \[(?P<typ>GC|Full GC) "
    r"\[(?P<seg>\w+): (?P<b>\d+)(?P<bu>[KBMG])->(?P<a>\d+)(?P<au>[KBMG])"
    r"\((?P<t>\d+)(?P<tu>[KBMG])\)\] (?P<secs>\d+\.\d+) secs\]$"
)

# unit → KB multiplier (javaGCStatsParser.sh:363-403; B kept out of the
# synth grammar to avoid sub-KB truncation ambiguity, supported here as /1024)
_UNIT_MULT = {"K": 1, "M": 1024, "G": 1024 * 1024}


def _to_kb(val, unit):
    """value+suffix → integer KB (M18), vectorized."""
    v = pc.cast(val, pa.int64())
    out = v  # K
    out = pc.if_else(pc.equal(unit, "M"), pc.multiply(v, 1024), out)
    out = pc.if_else(pc.equal(unit, "G"), pc.multiply(v, 1024 * 1024), out)
    out = pc.if_else(pc.equal(unit, "B"),
                     pc.divide(v, 1024), out)
    return out


def parse_gc_lines(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """GC lines → (line_id, jvm, gc_type, seg, before_k, after_k, total_k,
    diff_k, pct_after, pause_us)."""

    def fn(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["text"], GC_RE)
        sub = t.filter(pc.is_valid(m))
        ms = pc.extract_regex(sub["text"], GC_RE)

        def f(n):
            return pc.struct_field(ms, n)

        before_k = _to_kb(f("b"), f("bu"))
        after_k = _to_kb(f("a"), f("au"))
        total_k = _to_kb(f("t"), f("tu"))
        diff_k = pc.subtract(before_k, after_k)  # M19 reclaimed
        pct_after = pc.round(
            pc.multiply(
                pc.divide(pc.cast(after_k, pa.float64()),
                          pc.cast(total_k, pa.float64())),
                100.0,
            ),
            ndigits=4,
        )
        pause_us = pc.cast(
            pc.round(pc.multiply(pc.cast(f("secs"), pa.float64()), 1_000_000.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "line_id": sub["line_id"],
                "jvm": f("jvm"),
                "gc_type": f("typ"),
                "seg": f("seg"),
                "before_k": before_k,
                "after_k": after_k,
                "total_k": total_k,
                "diff_k": diff_k,
                "pct_after": pct_after,
                "pause_us": pause_us,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _compose(batch: pa.Table) -> pa.Table:
    eid = batch["event_id"].to_numpy()
    uidn = batch["user_id"].to_numpy()
    jvm = np.char.add("jvm", (uidn % 4).astype(str))
    full = eid % 5 == 0
    typ = np.where(full, "Full GC", "GC")
    seg = np.where(full, "ParOldGen", "PSYoungGen")
    unit = np.array(["K", "M", "G"], dtype=object)[eid % 3]
    b = eid % 10000 + 16
    a = eid % 3000 + 8
    t = 16384
    frac = (eid % 10_000_000).astype(str)
    lines = [
        f"{j} [{ty} [{sg}: {bb}{u}->{aa}{u}({t}{u})] 0.{fr.zfill(7)} secs]"
        for j, ty, sg, bb, aa, u, fr in zip(jvm, typ, seg, b, a, unit, frac)
    ]
    return pa.table(
        {"line_id": pa.array(eid, pa.int64()),
         "text": pa.array(lines, pa.string())}
    )


def synth_gc_lines(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → (line_id, text) verbose-GC-format lines."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return ds.map_batches(
        _compose, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


GC_TRUTH_CTE = """
gc_truth AS (
  SELECT
    event_id AS line_id,
    'jvm' || CAST(user_id % 4 AS VARCHAR) AS jvm,
    CASE WHEN event_id % 5 = 0 THEN 'Full GC' ELSE 'GC' END AS gc_type,
    CASE WHEN event_id % 5 = 0 THEN 'ParOldGen' ELSE 'PSYoungGen' END AS seg,
    CAST((event_id % 10000 + 16) * mult AS BIGINT) AS before_k,
    CAST((event_id % 3000 + 8) * mult AS BIGINT) AS after_k,
    CAST(16384 * mult AS BIGINT) AS total_k,
    CAST((event_id % 10000 + 16) * mult - (event_id % 3000 + 8) * mult AS BIGINT) AS diff_k,
    round_even((event_id % 3000 + 8) * 100.0 / 16384, 4) AS pct_after,
    CAST(round_even(CAST('0.' || lpad(CAST(event_id % 10000000 AS VARCHAR), 7, '0')
                         AS DOUBLE) * 1000000, 0) AS BIGINT) AS pause_us
  FROM (
    SELECT *, CAST(CASE event_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 1024
                   ELSE 1048576 END AS BIGINT) AS mult
    FROM events) e
)
""".strip()
