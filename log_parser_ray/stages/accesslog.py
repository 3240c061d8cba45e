"""Real Apache/IHS access-log parse pack (M4–M13 of SURVEY.md §2.2).

The reference's flagship grammar (webAccessLogParser.sh): a custom LogFormat
record split on `" `/`" ` quote boundaries into 7 fields, then decomposed
into the 26-column parsed table (mapping comment at
webAccessLogParser.sh:665-666). This module re-expresses every step as
vectorized Arrow RE2 kernels over a `text` column:

* M4  field split            — one named-group regex (ACCESS_RE)
* M5  timestamp parse        — strptime on the `[DD/Mon/YYYY:HH:MM:SS -Z]`
                               token (webAccessLogParser.sh:299-320)
* M6  method normalize/repair— glued `params…GET` records repaired by a
                               suffix-match, residue prepended to params
                               (webAccessLogParser.sh:327-378,415-420)
* M7  URL decompose          — domain/page/ext incl. the `/`-root and
                               dotted-first-segment special cases
                               (webAccessLogParser.sh:380-414)
* M8  JSESSIONID decompose   — strip `0000` prefix, split `sess:cloneID`,
                               `-` → `-` triple (webAccessLogParser.sh:426-445)
* M9  UID cookie extract     — (webAccessLogParser.sh:449-452)
* M10 RT convert + bucket    — µs→s + `<=1/<=5/<=10/<=20/>20` ranges on
                               exact integer µs (webAccessLogParser.sh:457-481)
* M11 UA classifier cascade  — ordered regex case table (UA_CASES, the
                               config-data analogue of the 15-case AWK
                               switch at webAccessLogParser.sh:500-654);
                               unknown agents → Other + side-output flag.
                               Field extraction uses regexes rather than the
                               AWK token-index arithmetic — same fields,
                               robust to token drift.
* M12 discard predicate      — curl UA or missing UID (webAccessLogParser.sh:680-683)
* ST2/J1 cloneID→WAS enrich  — broadcast dict lookup (webAccessLogParser.sh:196-201,440)

``access_cascade_sql`` / the synthesizer CTE in sources/accesssynth.py emit
the identical derivations in ANSI SQL so the whole pack is oracle-checkable
(both engines run RE2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

HTTP_METHODS = [
    "GET", "POST", "PUT", "HEAD", "OPTIONS", "CONNECT", "DELETE", "TRACE",
    "SECURE", "SEARCH", "PROPATCH", "PROFIND", "MKCOL",
]
_M = "|".join(HTTP_METHODS)

ACCESS_RE = (
    r'^(?P<client>\S+) (?P<ident>\S+) (?P<authuser>\S+) '
    r'\[(?P<dtm>[^ \]]+) (?P<tz>[-+]\d{4})\] '
    r'"(?P<reqline>[^"]*)" '
    r'(?P<response>\d+) (?P<size>\S+) '
    r'JSESSIONID="(?P<jsess_raw>[^"]*)" UID="(?P<uid>[^"]*)" '
    r'(?P<rt_us>\d+) (?P<byte_rcvd>\d+) (?P<byte_snt>\d+) '
    r'"(?P<ua>[^"]*)" (?P<websrvr>\S+)'
)

# cloneID → WAS name (WAS_CloneIDs.csv analogue — user-editable topology,
# SURVEY §2.10; broadcast once, looked up per row)
CLONE_MAP: dict[str, str] = {
    "cl0": "WAS_A", "cl1": "WAS_B", "cl2": "WAS_C", "cl3": "WAS_D",
}


def load_clone_map(path: str) -> dict[str, str]:
    """Parse the reference's WAS_CloneIDs.csv — ``cloneID|WASname|host``
    rows, first two fields keep, extras ignored (webAccessLogParser.sh:
    36,196-201 ``arrWasCloneIDs[ln[1]]=ln[2]``). Tiny file, read once on
    the driver; the map broadcasts by closure into the fused parse task."""
    out: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("|")
            if len(parts) >= 2 and parts[0]:
                out[parts[0].strip()] = parts[1].strip()
    return out

# RT ranges on integer µs (webAccessLogParser.sh:465-481 `<=` seconds)
RT_RANGES = [("<=1sec", 1_000_000), ("<=5sec", 5_000_000),
             ("<=10sec", 10_000_000), ("<=20sec", 20_000_000)]
RT_RANGE_OVER = ">20sec"

# Ordered UA classifier case table (M11). Each output value is
# literal_prefix + regex-extract (group named v; '' when the extract
# misses). First matching case wins; default = Other + unknown flag.
UA_CASES: list[dict] = [
    {
        "name": "x11_linux",
        "match": r"X11.*Linux",
        "browser": ("", r"(?P<v>\w+/[\d.]+)(?: \(\w+\))?$"),
        "os_name": ("Linux", None),
        "os_flav": ("X11", None),
        "os_ver": ("", r"rv:(?P<v>[\d.]+)"),
    },
    {
        "name": "firefox",
        "match": r"Firefox/[\d.]+",
        "browser": ("", r"(?P<v>Firefox/[\d.]+)"),
        "os_name": ("", r"\((?P<v>[^;)]+)"),
        "os_flav": ("", r"; (?P<v>WOW64|Win64)"),
        "os_ver": ("", r"Windows NT (?P<v>[\d.]+)"),
    },
    {
        "name": "msie_compat",
        "match": r"compatible; MSIE [\d.]+; Windows NT",
        "browser": ("", r"(?P<v>MSIE [\d.]+)"),
        "os_name": ("Windows NT", None),
        "os_flav": ("", r"; (?P<v>WOW64|Win64)"),
        "os_ver": ("", r"Windows NT (?P<v>[\d.]+)"),
    },
    {
        "name": "ie11_like_gecko",
        "match": r"Trident/[\d.]+;.*rv:[\d.]+\) like Gecko",
        "browser": ("MSIE/", r"rv:(?P<v>[\d.]+)"),
        "os_name": ("Windows NT", None),
        "os_flav": ("", r"; (?P<v>WOW64|Win64)"),
        "os_ver": ("", r"Windows NT (?P<v>[\d.]+)"),
    },
    {
        "name": "edge",
        "match": r"Edge/[\d.]+",
        "browser": ("", r"(?P<v>Edge/[\d.]+)"),
        "os_name": ("", r"\((?P<v>Windows NT [\d.]+)"),
        "os_flav": ("", r"; (?P<v>WOW64|Win64)"),
        "os_ver": ("", r"Windows NT (?P<v>[\d.]+)"),
    },
    {
        "name": "ipad",
        "match": r"iPad.*AppleWebKit/.*Safari/",
        "browser": ("", r"(?P<v>(?:Version|CriOS)/[\d.]+)"),
        "os_name": ("iPad", None),
        "os_flav": ("like Mac OS X", None),
        "os_ver": ("", r"CPU OS (?P<v>[\d_]+)"),
    },
    {
        "name": "iphone",
        "match": r"iPhone.*AppleWebKit/.*Safari/",
        "browser": ("", r"(?P<v>(?:Version|CriOS)/[\d.]+)"),
        "os_name": ("iPhone", None),
        "os_flav": ("like Mac OS X", None),
        "os_ver": ("", r"iPhone OS (?P<v>[\d_]+)"),
    },
    {
        "name": "android_chrome",
        "match": r"Linux; Android.*AppleWebKit/.*Safari/",
        "browser": ("", r"(?P<v>Chrome/[\d.]+)"),
        "os_name": ("Android", None),
        "os_flav": ("", r"Android [\d.]+; (?P<v>[^;)]+)"),
        "os_ver": ("", r"Android (?P<v>[\d.]+)"),
    },
    {
        "name": "chrome_safari",
        "match": r"AppleWebKit/.*\(KHTML, like Gecko\).*Chrome/.*Safari/",
        "browser": ("", r"(?P<v>Chrome/[\d.]+)"),
        "os_name": ("", r"\((?P<v>[^;)]+)"),
        "os_flav": ("", r"; (?P<v>WOW64|Win64)"),
        "os_ver": ("", r"Windows NT (?P<v>[\d.]+)"),
    },
]


def _ua_value(ua, spec):
    lit, pat = spec
    if pat is None:
        return pa.array([lit] * len(ua), pa.string())
    ex = pc.fill_null(pc.struct_field(pc.extract_regex(ua, pat), "v"), "")
    if not lit:
        return ex
    return pc.binary_join_element_wise(lit, ex, "")


def classify_ua(ua: pa.ChunkedArray | pa.Array):
    """(browser, os_name, os_flav, os_ver, ua_unknown) columns via the
    ordered cascade — evaluated back-to-front with if_else so the FIRST
    matching case wins, like the AWK switch.

    UA columns are massively repetitive (a day of traffic has dozens of
    distinct agents, not millions), so the cascade's ~45 regex passes run
    over the DICTIONARY of unique values only, then a C-speed take maps
    every row — same trick as the enrich broadcast lookup."""
    arr = ua.combine_chunks() if isinstance(ua, pa.ChunkedArray) else ua
    arr = pc.fill_null(arr, "")  # unmatched rows classify as Other, not null
    enc = arr.dictionary_encode()
    uniq = enc.dictionary
    if len(uniq) == 0:
        empty = pa.array([], pa.string())
        return empty, empty, empty, empty, pa.array([], pa.bool_())

    n = len(uniq)
    browser = pa.array(["Other"] * n, pa.string())
    os_name = pa.array(["Other"] * n, pa.string())
    os_flav = pa.array(["na"] * n, pa.string())
    os_ver = pa.array(["na"] * n, pa.string())
    unknown = pa.array([True] * n, pa.bool_())
    for case in reversed(UA_CASES):
        m = pc.fill_null(pc.match_substring_regex(uniq, case["match"]), False)
        browser = pc.if_else(m, _ua_value(uniq, case["browser"]), browser)
        os_name = pc.if_else(m, _ua_value(uniq, case["os_name"]), os_name)
        os_flav = pc.if_else(m, _ua_value(uniq, case["os_flav"]), os_flav)
        os_ver = pc.if_else(m, _ua_value(uniq, case["os_ver"]), os_ver)
        unknown = pc.if_else(m, pa.scalar(False), unknown)
    ix = enc.indices
    return (browser.take(ix), os_name.take(ix), os_flav.take(ix),
            os_ver.take(ix), unknown.take(ix))


def _sql_pat(pat: str) -> str:
    return pat.replace("(?P<v>", "(")


def _sql_value(col: str, spec) -> str:
    lit, pat = spec
    if pat is None:
        return f"'{lit}'"
    ex = f"regexp_extract({col}, '{_sql_pat(pat)}', 1)"
    return f"'{lit}' || {ex}" if lit else ex


def ua_cascade_sql(col: str, out: str) -> str:
    """The identical cascade as one SQL CASE per output column."""
    whens = []
    for case in UA_CASES:
        whens.append(
            f"WHEN regexp_matches({col}, '{case['match']}') "
            f"THEN {_sql_value(col, case[out])}"
        )
    default = {"browser": "'Other'", "os_name": "'Other'",
               "os_flav": "'na'", "os_ver": "'na'"}[out]
    return "CASE " + " ".join(whens) + f" ELSE {default} END"


def make_access_parser(clone_map: dict[str, str] | None = None):
    """Build the vectorized access-log parse fn (text → 26-column table)."""
    clone_map = dict(CLONE_MAP if clone_map is None else clone_map)

    def parse(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        m = pc.extract_regex(text, ACCESS_RE)
        matched = pc.is_valid(m)

        def f(name):
            return pc.struct_field(m, name)

        # --- M5 timestamp
        # second-precision first (Arrow %S renders a fraction for [us]),
        # then widen to the schema's timestamp[us]; localized month tokens
        # (usage.sh:137-157's LC_ALL-dependent %b) normalize to English
        # first — a zero-copy no-op on English-locale logs
        from log_parser_ray.sources.rawlogs import normalize_month_tokens

        ts_s = pc.strptime(normalize_month_tokens(f("dtm")),
                           format="%d/%b/%Y:%H:%M:%S", unit="s",
                           error_is_null=True)
        ts = pc.cast(ts_s, pa.timestamp("us"))
        dt = pc.strftime(ts_s, format="%Y-%m-%d")
        tm = pc.strftime(ts_s, format="%H:%M:%S")
        hour = pc.cast(pc.hour(ts), pa.int32())
        tz = f("tz")

        # --- M6 method + repair
        reqline = f("reqline")
        tok1 = pc.struct_field(pc.extract_regex(reqline, r"^(?P<t>\S+)"), "t")
        clean = pc.struct_field(
            pc.extract_regex(tok1, rf"^(?P<m>{_M})$"), "m"
        )
        glued = pc.extract_regex(tok1, rf"^(?P<pre>.+?)(?P<m>{_M})$")
        request = pc.coalesce(clean, pc.struct_field(glued, "m"))
        pre_params = pc.if_else(
            pc.is_valid(clean),
            pa.nulls(len(batch), pa.string()),
            pc.struct_field(glued, "pre"),
        )

        # --- M7 URL decompose
        url = pc.struct_field(pc.extract_regex(reqline, r"^\S+ (?P<u>\S+)"), "u")
        uri_path = pc.fill_null(
            pc.struct_field(pc.extract_regex(url, r"^(?P<p>[^?]*)"), "p"), ""
        )
        params0 = pc.fill_null(
            pc.struct_field(pc.extract_regex(url, r"\?(?P<q>.*)$"), "q"), ""
        )
        # repaired residue joins params (webAccessLogParser.sh:415-420)
        params = pc.if_else(
            pc.is_valid(pre_params),
            pc.if_else(
                pc.equal(params0, ""),
                pc.fill_null(pre_params, ""),
                pc.binary_join_element_wise(
                    params0, pc.fill_null(pre_params, ""), "&"
                ),
            ),
            params0,
        )
        protocol = pc.fill_null(
            pc.struct_field(pc.extract_regex(reqline, r"^\S+ \S+ (?P<pr>\S+)"), "pr"),
            "",
        )

        seg1 = pc.struct_field(pc.extract_regex(uri_path, r"^/(?P<s>[^/]+)"), "s")
        seg1_dotted = pc.fill_null(pc.match_substring(seg1, "."), False)
        last_seg = pc.fill_null(
            pc.struct_field(pc.extract_regex(uri_path, r"/(?P<l>[^/]*)$"), "l"), ""
        )
        is_root = pc.equal(uri_path, "/")
        is_empty = pc.equal(uri_path, "")
        domain = pc.if_else(
            is_empty, "NA",
            pc.if_else(
                pc.or_(is_root, seg1_dotted), "/", pc.fill_null(seg1, "NA")
            ),
        )
        page = pc.if_else(
            pc.or_(is_empty, is_root), "NA",
            pc.if_else(seg1_dotted, pc.fill_null(seg1, "NA"), last_seg),
        )
        # ext: dotted-first-seg takes the SECOND dot token (arrPage[2],
        # webAccessLogParser.sh:393); the normal path takes the LAST
        # (arrPage[length], :401) — the reference's asymmetry, kept.
        ext_first = pc.struct_field(
            pc.extract_regex(page, r"^[^.]*\.(?P<e>[^.]*)"), "e"
        )
        ext_last = pc.struct_field(pc.extract_regex(page, r"\.(?P<e>[^.]*)$"), "e")
        ext = pc.if_else(
            pc.or_(is_empty, is_root), "NA",
            pc.if_else(
                seg1_dotted,
                pc.fill_null(ext_first, "NA"),
                pc.fill_null(ext_last, "NA"),
            ),
        )

        # --- M8 JSESSIONID decompose + ST2 cloneID→WAS broadcast lookup
        jraw = f("jsess_raw")
        jmiss = pc.equal(jraw, "-")
        sess = pc.fill_null(
            pc.struct_field(pc.extract_regex(jraw, r"^(?P<s>[^:]*)"), "s"), ""
        )
        clone = pc.fill_null(
            pc.struct_field(pc.extract_regex(jraw, r":(?P<c>.*)$"), "c"), "-"
        )
        jsession = pc.if_else(
            jmiss, "-", pc.utf8_slice_codeunits(sess, 4, 1 << 30)
        )
        clone_id = pc.if_else(jmiss, "-", clone)
        enc = clone_id.combine_chunks().dictionary_encode() if isinstance(
            clone_id, pa.ChunkedArray
        ) else clone_id.dictionary_encode()
        mapped = pa.array(
            [clone_map.get(c, "-") for c in enc.dictionary.to_pylist()], pa.string()
        )
        was = mapped.take(enc.indices)

        # --- M10 response time + range (exact integer µs)
        rt_us = pc.cast(f("rt_us"), pa.int64())
        resp_range = pa.nulls(len(batch), pa.string())
        for label, bound in reversed(RT_RANGES):
            resp_range = pc.if_else(
                pc.fill_null(pc.less_equal(rt_us, bound), False),
                pa.scalar(label), resp_range,
            )
        resp_range = pc.if_else(
            pc.fill_null(pc.greater(rt_us, RT_RANGES[-1][1]), False),
            pa.scalar(RT_RANGE_OVER), resp_range,
        )

        # --- M11 UA cascade
        ua = f("ua")
        browser, os_name, os_flav, os_ver, ua_unknown = classify_ua(ua)

        # --- M12 discard predicate: curl UA or missing UID
        uid = f("uid")
        is_curl = pc.fill_null(pc.match_substring_regex(ua, r"curl/.*"), False)
        no_uid = pc.fill_null(
            pc.or_(pc.equal(uid, "-"), pc.equal(uid, "")), True
        )
        sink = pc.if_else(
            pc.invert(matched),
            pa.scalar("unparsed"),
            pc.if_else(pc.or_(is_curl, no_uid), pa.scalar("discarded"),
                       pa.scalar("parsed")),
        )

        out = {
            "websrvr": f("websrvr"), "dt": dt, "tm": tm, "tz": tz,
            "hour": hour, "jsession": jsession, "clone_id": clone_id,
            "was": was, "domain": domain, "page": page, "ext": ext,
            "uri_path": uri_path, "params": params, "protocol": protocol,
            "request": request, "response": pc.cast(f("response"), pa.int32()),
            "size": f("size"),
            "byte_rcvd": pc.cast(f("byte_rcvd"), pa.int64()),
            "byte_snt": pc.cast(f("byte_snt"), pa.int64()),
            "uid": uid, "rt_us": rt_us, "resp_range": resp_range,
            "browser": browser, "os_name": os_name, "os_flav": os_flav,
            "os_ver": os_ver, "ts": ts, "ua_unknown": ua_unknown,
            "sink": sink,
        }
        res = batch
        for name, col in out.items():
            if name in res.column_names:  # e.g. transcript-schema `ts`
                res = res.set_column(res.schema.get_field_index(name), name, col)
            else:
                res = res.append_column(name, col)
        return res

    return parse


def parse_access_log(
    ds: "ray.data.Dataset",
    clone_map: dict[str, str] | None = None,
    batch_size: int = 32768,
) -> "ray.data.Dataset":
    """text-bearing Dataset → parsed access-log Dataset (stateless tasks)."""
    return ds.map_batches(
        make_access_parser(clone_map),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
