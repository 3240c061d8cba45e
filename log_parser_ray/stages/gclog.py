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


def _to_kb_f(val, unit):
    """value+suffix → KB as float64 (M18), vectorized. Float for the B
    branch because the reference's awk divides in floating point
    (javaGCStatsParser.sh:379-381) and derives diff/pct from the UNtruncated
    values; K/M/G stay integral so downstream truncation is the identity."""
    v = pc.cast(val, pa.float64())
    out = v  # K
    out = pc.if_else(pc.equal(unit, "M"), pc.multiply(v, 1024.0), out)
    out = pc.if_else(pc.equal(unit, "G"), pc.multiply(v, 1024.0 * 1024), out)
    out = pc.if_else(pc.equal(unit, "B"), pc.divide(v, 1024.0), out)
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

        # float KB first: diff and pct derive from the UNtruncated values
        # (awk computes them before its printf %d truncation), so a B-suffix
        # record rounds exactly like the reference; truncation to integer KB
        # happens only at the emitted columns
        bf = _to_kb_f(f("b"), f("bu"))
        af = _to_kb_f(f("a"), f("au"))
        tf = _to_kb_f(f("t"), f("tu"))
        before_k = pc.cast(pc.trunc(bf), pa.int64())
        after_k = pc.cast(pc.trunc(af), pa.int64())
        total_k = pc.cast(pc.trunc(tf), pa.int64())
        diff_k = pc.cast(pc.trunc(pc.subtract(bf, af)), pa.int64())  # M19
        pct_after = pc.round(
            pc.multiply(pc.divide(af, tf), 100.0), ndigits=4
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

    def istr(arr):
        return pc.cast(pa.array(arr), pa.string())

    jvm = pc.binary_join_element_wise("jvm", istr(uidn % 4), "")
    full = pa.array(eid % 5 == 0)
    typ = pc.if_else(full, "Full GC", "GC")
    seg = pc.if_else(full, "ParOldGen", "PSYoungGen")
    u = pa.array(["K", "M", "G"], pa.string()).take(pa.array(eid % 3))
    b = eid % 10000 + 16
    a = eid % 3000 + 8
    t = 16384
    frac = pc.utf8_lpad(istr(eid % 10_000_000), 7, "0")
    line = pc.binary_join_element_wise(
        jvm, " [", typ, " [", seg, ": ", istr(b), u, "->", istr(a), u,
        "(", istr(np.full(len(eid), t)), u, ")] 0.", frac, " secs]", "",
    )
    return pa.table({"line_id": pa.array(eid, pa.int64()), "text": line})


def synth_gc_lines(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → (line_id, text) verbose-GC-format lines."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return ds.map_batches(
        _compose, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


# ---------------------------------------------------------------------------
# REAL multi-line HotSpot grammar: -XX:+PrintGCDetails -XX:+PrintHeapAtGC
# (javaGCStatsParser.sh:158-283 — the reference's one true multi-line record:
# `{Heap before GC invocations=…` … `}` with carry-over state between lines).
#
# Ray shape: per-file line streams reassemble into one PAYLOAD STRING per
# invocation block (ordered per-conversation scan, sessions._per_conv_blocks
# machinery), then every field extracts from the payload column with
# vectorized RE2 kernels — the awk state machine becomes a handful of
# anchored multi-line regexes over whole blocks. Minor-GC old/perm
# before/after values come from the Heap-before / Heap-after sections, full
# GCs carry all segments on the GC line itself, exactly the awk's
# _xtractOldPermBVals / _xtractOldPermAVals phase flags. Values in real
# PrintHeapAtGC streams are K-suffixed; unit normalization for the
# single-line K/B/M/G variants lives in `_to_kb_f` above.

GC_BLOCK_BEGIN = "{Heap before GC invocations="
GC_BLOCK_END = "}"

_B_OLD_RE = r"(?s)\{Heap before.*?ParOldGen\s+total \d+K, used (?P<ob>\d+)K"
_B_PERM_RE = r"(?s)\{Heap before.*?PSPermGen\s+total \d+K, used (?P<pb>\d+)K"
_A_OLD_RE = r"(?s)Heap after.*?ParOldGen\s+total (?P<ot>\d+)K, used (?P<oa>\d+)K"
_A_PERM_RE = r"(?s)Heap after.*?PSPermGen\s+total (?P<pt>\d+)K, used (?P<pa>\d+)K"
_INVOC_RE = r"Heap after GC invocations=(?P<all>\d+) \(full (?P<full>\d+)\)"
_GCLINE_RE = (
    r"(?P<dt>\d{4}-\d{2}-\d{2})T(?P<tm>[\d:.]+)(?P<tz>[+-]\d{4}): "
    r"\[(?P<typ>Full GC \(System\)|Full GC|GC)[ -]"
)
_YOUNG_RE = r"\[PSYoungGen: (?P<yb>\d+)K->(?P<ya>\d+)K\((?P<yt>\d+)K\)\]"
_F_OLD_RE = r"\[ParOldGen: (?P<ob>\d+)K->(?P<oa>\d+)K\((?P<ot>\d+)K\)\]"
_F_PERM_RE = r"\[PSPermGen: (?P<pb>\d+)K->(?P<pa>\d+)K\((?P<pt>\d+)K\)\]"
_HEAP_RE = r"\)\] (?P<hb>\d+)K->(?P<ha>\d+)K\((?P<ht>\d+)K\)"
_SECS_RE = r", (?P<secs>\d+\.\d+) secs\]"
_TIMES_RE = (
    r"\[Times: user=(?P<usr>\d+\.\d+) sys=(?P<sy>\d+\.\d+), "
    r"real=(?P<real>\d+\.\d+) (?P<runit>\w+)\]"
)


def reassemble_gc_blocks(lines: "ray.data.Dataset") -> "ray.data.Dataset":
    """(conv_id, turn_idx, text) line stream → one row per GC invocation
    block: (conv_id, start_turn, payload). A block runs from `{Heap before
    GC invocations=` to the next `}` line within one conversation (= one
    file/JVM); unterminated trailing blocks are dropped, mirroring the
    reference's per-file last-record handling."""
    from log_parser_ray.stages.aggregate import group_safe_map

    keep = lines.select_columns(["conv_id", "turn_idx", "text"])

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "start_turn": pa.array([], pa.int64()),
            "payload": pa.array([], pa.string()),
        }
    )

    def assemble(t: pa.Table) -> pa.Table:
        # Vectorized segmentation (the awk state machine's block structure is
        # a cumulative sum): block id = running count of BEGIN markers per
        # conv; a block's rows run from its BEGIN to its FIRST `}` line; a
        # BEGIN before the previous block's `}` implicitly drops the
        # unterminated block (its rows get a new bid), and a trailing block
        # with no `}` drops — identical semantics to the reference's
        # per-file carry-over handling. Pure numpy/arrow kernels: the
        # payload concatenation is ONE pc.binary_join over a ListArray (the
        # per-group Python "\n".join this replaces was ~2 s per million
        # lines).
        n = t.num_rows
        if n == 0:
            return empty
        enc = t["conv_id"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        codes_s, turn_s = codes[order], turn[order]
        text = pc.fill_null(t["text"].combine_chunks(), "").take(
            pa.array(order, pa.int64())
        )
        is_b = pc.starts_with(text, GC_BLOCK_BEGIN).to_numpy(zero_copy_only=False)
        # per-conv 1-based running BEGIN count (0 before a conv's first BEGIN)
        conv_start = np.flatnonzero(
            np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        )
        cumb = np.cumsum(is_b)
        base = np.repeat(
            cumb[conv_start] - is_b[conv_start],
            np.diff(np.append(conv_start, n)),
        )
        bid = cumb - base
        idx = np.flatnonzero(bid > 0)
        if not len(idx):
            return empty
        codes_k, bid_k, turn_k = codes_s[idx], bid[idx], turn_s[idx]
        text_k = text.take(pa.array(idx, pa.int64()))
        is_e = pc.starts_with(text_k, GC_BLOCK_END).to_numpy(zero_copy_only=False)
        # (conv, bid) groups are contiguous runs after the lexsort
        gstart = np.flatnonzero(
            np.concatenate(
                ([True], (codes_k[1:] != codes_k[:-1]) | (bid_k[1:] != bid_k[:-1]))
            )
        )
        m = len(idx)
        pos = np.arange(m)
        big = np.iinfo(np.int64).max
        end_g = np.minimum.reduceat(np.where(is_e, pos, big), gstart)
        surv = end_g != big  # groups with no `}` drop whole
        if not surv.any():
            return empty
        starts_s, ends_s = gstart[surv], end_g[surv] + 1
        lens = ends_s - starts_s
        # kept rows per group = BEGIN..first `}` inclusive; concatenated
        # ranges via the repeat-offset identity (no per-group Python loop)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        flat = np.arange(offsets[-1]) + np.repeat(starts_s - offsets[:-1], lens)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                text_k.take(pa.array(flat, pa.int64())),
            ),
            "\n",
        )
        return pa.table(
            {
                "conv_id": enc.dictionary.take(
                    pa.array(codes_k[starts_s], pa.int64())
                ),
                "start_turn": pa.array(turn_k[starts_s], pa.int64()),
                "payload": joined,
            }
        )

    return group_safe_map(keep, ["conv_id"], assemble)


def parse_gc_invocations(blocks: "ray.data.Dataset") -> "ray.data.Dataset":
    """Reassembled invocation blocks → one row per GC with the reference's
    .vgc.all column set (javaGCStatsParser.sh:151): per-generation
    before/after/diff/total/pct in K, times in µs, GC counters. gc_type uses
    the reference's names (GC / FULLGC / FULLGC_SYS)."""

    def fn(t: pa.Table) -> pa.Table:
        pl = t["payload"]
        gl = pc.extract_regex(pl, _GCLINE_RE)
        sub = t.filter(pc.is_valid(gl))
        pl = sub["payload"]
        gl = pc.extract_regex(pl, _GCLINE_RE)

        def f(m, n):
            return pc.struct_field(m, n)

        def fi(m, n):
            return pc.cast(pc.struct_field(m, n), pa.int64())

        young = pc.extract_regex(pl, _YOUNG_RE)
        heap = pc.extract_regex(pl, _HEAP_RE)
        invoc = pc.extract_regex(pl, _INVOC_RE)
        times = pc.extract_regex(pl, _TIMES_RE)
        typ_raw = f(gl, "typ")
        is_minor = pc.equal(typ_raw, "GC")
        # minor GC: old/perm from the Heap-before / Heap-after sections;
        # full GC: all segments on the GC line (awk phase-flag semantics)
        b_old, b_perm = pc.extract_regex(pl, _B_OLD_RE), pc.extract_regex(pl, _B_PERM_RE)
        a_old, a_perm = pc.extract_regex(pl, _A_OLD_RE), pc.extract_regex(pl, _A_PERM_RE)
        f_old, f_perm = pc.extract_regex(pl, _F_OLD_RE), pc.extract_regex(pl, _F_PERM_RE)
        ob = pc.if_else(is_minor, fi(b_old, "ob"), fi(f_old, "ob"))
        oa = pc.if_else(is_minor, fi(a_old, "oa"), fi(f_old, "oa"))
        ot = pc.if_else(is_minor, fi(a_old, "ot"), fi(f_old, "ot"))
        pb = pc.if_else(is_minor, fi(b_perm, "pb"), fi(f_perm, "pb"))
        pa_ = pc.if_else(is_minor, fi(a_perm, "pa"), fi(f_perm, "pa"))
        pt = pc.if_else(is_minor, fi(a_perm, "pt"), fi(f_perm, "pt"))
        gc_type = pc.if_else(
            is_minor,
            pa.scalar("GC"),
            pc.if_else(pc.equal(typ_raw, "Full GC"),
                       pa.scalar("FULLGC"), pa.scalar("FULLGC_SYS")),
        )

        def pct(a, tot):
            return pc.round(
                pc.multiply(pc.divide(pc.cast(a, pa.float64()),
                                      pc.cast(tot, pa.float64())), 100.0),
                ndigits=4,
            )

        def to_us(m, n):
            return pc.cast(
                pc.round(pc.multiply(pc.cast(f(m, n), pa.float64()), 1e6)),
                pa.int64(),
            )

        yb, ya, yt = fi(young, "yb"), fi(young, "ya"), fi(young, "yt")
        hb, ha, ht = fi(heap, "hb"), fi(heap, "ha"), fi(heap, "ht")
        all_gcs, fgcs = fi(invoc, "all"), fi(invoc, "full")
        # jvm = conversation (file) name, minus any synth shard suffix
        jvm = pc.list_element(pc.split_pattern(sub["conv_id"], "@"), 0)
        return pa.table(
            {
                "jvm": jvm,
                "gc_type": gc_type,
                "dt": f(gl, "dt"), "tm": f(gl, "tm"), "tz": f(gl, "tz"),
                "hour": pc.cast(pc.utf8_slice_codeunits(f(gl, "tm"), 0, 2), pa.int32()),
                "yng_before_k": yb, "yng_after_k": ya,
                "yng_diff_k": pc.subtract(yb, ya), "yng_total_k": yt,
                "yng_pct": pct(ya, yt),
                "old_before_k": ob, "old_after_k": oa,
                "old_diff_k": pc.subtract(ob, oa), "old_total_k": ot,
                "old_pct": pct(oa, ot),
                "perm_before_k": pb, "perm_after_k": pa_,
                "perm_diff_k": pc.subtract(pb, pa_), "perm_total_k": pt,
                "perm_pct": pct(pa_, pt),
                "heap_before_k": hb, "heap_after_k": ha,
                "heap_diff_k": pc.subtract(hb, ha), "heap_total_k": ht,
                "heap_pct": pct(ha, ht),
                # RealTime = the Times segment's real value (awk _rlTm,
                # javaGCStatsParser.sh:343-356), not the GC-line pause
                "user_us": to_us(times, "usr"), "sys_us": to_us(times, "sy"),
                "real_us": to_us(times, "real"), "runit": f(times, "runit"),
                "gcs": pc.subtract(all_gcs, fgcs), "fgcs": fgcs,
                "all_gcs": all_gcs,
            }
        )

    return blocks.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _compose_stream(batch: pa.Table) -> pa.Table:
    """events rows → multi-line verbose-GC blocks (10 line rows per event),
    fully vectorized (one binary_join kernel per block line). Deterministic
    twin of GC_MULTI_TRUTH_CTE."""
    eid = batch["event_id"].to_numpy()
    uidn = batch["user_id"].to_numpy()

    def istr(a):
        return pc.cast(pa.array(a), pa.string())

    def j(*parts):
        return pc.binary_join_element_wise(*parts, "")

    conv = j("jvm", istr(uidn % 4), "@", istr(eid % 256))
    allg, fullg = istr(eid + 10), istr(eid % 7)
    yb, ya, yt = istr(eid % 10000 + 16), istr(eid % 3000 + 8), "16384"
    ob, oa, ot = istr(eid % 8000 + 32), istr(eid % 2000 + 16), "32768"
    pb, pa_, pt = istr(eid % 500 + 64), istr(eid % 400 + 32), "4096"
    hb = istr((eid % 10000 + 16) + (eid % 8000 + 32))
    ha = istr((eid % 3000 + 8) + (eid % 2000 + 16))
    ht = "49152"
    stamp = j("2023-11-01T", pc.utf8_lpad(istr(eid % 24), 2, "0"),
              ":00:00.000-0500")
    secs = j("0.", pc.utf8_lpad(istr(eid % 10_000_000), 7, "0"))
    times = j("[Times: user=0.", istr(eid % 90 + 10), " sys=0.0",
              istr(eid % 9), ", real=", secs, " secs]")
    full = pa.array(eid % 5 == 0)
    label = pc.if_else(pa.array(eid % 10 == 0), "Full GC (System)", "Full GC")
    gc_minor = j(stamp, ": [GC [PSYoungGen: ", yb, "K->", ya, "K(", yt,
                 "K)] ", hb, "K->", ha, "K(", ht, "K), ", secs, " secs] ",
                 times)
    gc_full = j(stamp, ": [", label, " [PSYoungGen: ", yb, "K->", ya, "K(",
                yt, "K)] [ParOldGen: ", ob, "K->", oa, "K(", ot, "K)] ", hb,
                "K->", ha, "K(", ht, "K) [PSPermGen: ", pb, "K->", pa_, "K(",
                pt, "K)], ", secs, " secs] ", times)
    block_lines = [
        j("{Heap before GC invocations=", allg, " (full ", fullg, "):"),
        j(" PSYoungGen      total ", yt, "K, used ", yb, "K [0x0,0x0)"),
        j(" ParOldGen       total ", ot, "K, used ", ob, "K [0x0,0x0)"),
        j(" PSPermGen       total ", pt, "K, used ", pb, "K [0x0,0x0)"),
        pc.if_else(full, gc_full, gc_minor),
        j("Heap after GC invocations=", allg, " (full ", fullg, "):"),
        j(" PSYoungGen      total ", yt, "K, used ", ya, "K [0x0,0x0)"),
        j(" ParOldGen       total ", ot, "K, used ", oa, "K [0x0,0x0)"),
        j(" PSPermGen       total ", pt, "K, used ", pa_, "K [0x0,0x0)"),
        pa.array(["}"] * len(eid), pa.string()),
    ]
    base = eid * 16
    parts = [
        pa.table(
            {
                "conv_id": conv,
                "turn_idx": pa.array(base + i, pa.int64()),
                "text": line,
            }
        )
        for i, line in enumerate(block_lines)
    ]
    return pa.concat_tables(parts)


def synth_gc_stream(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → multi-line verbose-GC (conv_id, turn_idx, text)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return ds.map_batches(
        _compose_stream, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    )


GC_MULTI_TRUTH_CTE = """
gc_multi_truth AS (
  SELECT
    'jvm' || CAST(user_id % 4 AS VARCHAR) AS jvm,
    CASE WHEN event_id % 10 = 0 THEN 'FULLGC_SYS'
         WHEN event_id % 5 = 0 THEN 'FULLGC' ELSE 'GC' END AS gc_type,
    '2023-11-01' AS dt,
    lpad(CAST(event_id % 24 AS VARCHAR), 2, '0') || ':00:00.000' AS tm,
    '-0500' AS tz,
    CAST(event_id % 24 AS INTEGER) AS hour,
    CAST(event_id % 10000 + 16 AS BIGINT) AS yng_before_k,
    CAST(event_id % 3000 + 8 AS BIGINT) AS yng_after_k,
    CAST((event_id % 10000 + 16) - (event_id % 3000 + 8) AS BIGINT) AS yng_diff_k,
    CAST(16384 AS BIGINT) AS yng_total_k,
    round_even((event_id % 3000 + 8) * 100.0 / 16384, 4) AS yng_pct,
    CAST(event_id % 8000 + 32 AS BIGINT) AS old_before_k,
    CAST(event_id % 2000 + 16 AS BIGINT) AS old_after_k,
    CAST((event_id % 8000 + 32) - (event_id % 2000 + 16) AS BIGINT) AS old_diff_k,
    CAST(32768 AS BIGINT) AS old_total_k,
    round_even((event_id % 2000 + 16) * 100.0 / 32768, 4) AS old_pct,
    CAST(event_id % 500 + 64 AS BIGINT) AS perm_before_k,
    CAST(event_id % 400 + 32 AS BIGINT) AS perm_after_k,
    CAST((event_id % 500 + 64) - (event_id % 400 + 32) AS BIGINT) AS perm_diff_k,
    CAST(4096 AS BIGINT) AS perm_total_k,
    round_even((event_id % 400 + 32) * 100.0 / 4096, 4) AS perm_pct,
    CAST((event_id % 10000 + 16) + (event_id % 8000 + 32) AS BIGINT) AS heap_before_k,
    CAST((event_id % 3000 + 8) + (event_id % 2000 + 16) AS BIGINT) AS heap_after_k,
    CAST(((event_id % 10000 + 16) + (event_id % 8000 + 32))
         - ((event_id % 3000 + 8) + (event_id % 2000 + 16)) AS BIGINT) AS heap_diff_k,
    CAST(49152 AS BIGINT) AS heap_total_k,
    round_even(((event_id % 3000 + 8) + (event_id % 2000 + 16)) * 100.0 / 49152, 4) AS heap_pct,
    CAST(round_even(CAST((event_id % 90 + 10) AS DOUBLE) / 100 * 1000000, 0) AS BIGINT) AS user_us,
    CAST(round_even(CAST(event_id % 9 AS DOUBLE) / 100 * 1000000, 0) AS BIGINT) AS sys_us,
    CAST(round_even(CAST('0.' || lpad(CAST(event_id % 10000000 AS VARCHAR), 7, '0')
                         AS DOUBLE) * 1000000, 0) AS BIGINT) AS real_us,
    'secs' AS runit,
    CAST((event_id + 10) - (event_id % 7) AS BIGINT) AS gcs,
    CAST(event_id % 7 AS BIGINT) AS fgcs,
    CAST(event_id + 10 AS BIGINT) AS all_gcs
  FROM events
)
""".strip()


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
