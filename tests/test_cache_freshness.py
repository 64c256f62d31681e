"""RFC 9111 server-declared freshness (recrawl.cache_ttl_s /
recrawl_due_ttl) + the WARC header reader feeding it."""

from __future__ import annotations

import gzip
import math
from email.utils import parsedate_to_datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import recrawl
from website_to_agent_spark.sources import warc

D0 = "Thu, 01 Jan 2026 00:00:00 GMT"
D1H = "Thu, 01 Jan 2026 01:00:00 GMT"
DM1 = "Wed, 31 Dec 2025 00:00:00 GMT"

CASES = [
    # (cache_control, expires, date, last_modified) -> expected ttl
    ("max-age=3600", None, None, None),
    ("public, s-maxage=600, max-age=3600", None, None, None),
    ('private, max-age="120"', None, None, None),
    ("no-cache, max-age=3600", None, None, None),
    ("no-store", None, None, None),
    (None, D1H, D0, None),            # Expires − Date
    (None, DM1, D0, None),            # already expired → clamp 0
    (None, "0", D0, None),            # invalid Expires → 0
    (None, "-1", None, None),
    (None, None, D0, DM1),            # heuristic 10% of 1 day
    (None, None, None, None),         # no signal → NULL
    ("public", None, None, None),     # cc present, no lifetime → NULL
    ("max-age=60", D1H, D0, None),    # max-age beats Expires
]


def py_ttl(cc, exp, date, lm, frac=0.1):
    cl = (cc or "").lower()
    if "no-store" in cl or "no-cache" in cl:
        return 0
    import re
    m = re.search(r's-maxage\s*=\s*"?(\d+)', cl) or \
        re.search(r'max-age\s*=\s*"?(\d+)', cl)
    if m:
        return int(m.group(1))

    def ep(s):
        try:
            return int(parsedate_to_datetime(s).timestamp()) if s else None
        except (TypeError, ValueError):
            return None

    ee, de, le = ep(exp), ep(date), ep(lm)
    if ee is not None and de is not None:
        return max(ee - de, 0)
    if exp is not None and exp.strip():
        return 0
    if le is not None and de is not None and de >= le:
        return math.floor((de - le) * frac)
    return None


def _ttl_rows(spark):
    df = spark.createDataFrame(
        [(i,) + c for i, c in enumerate(CASES)],
        "i int, cc string, exp string, d string, lm string",
    )
    out = df.select(
        "i",
        recrawl.cache_ttl_s(F.col("cc"), F.col("exp"), F.col("d"),
                            F.col("lm")),
    )
    return {r.i: r.ttl_s for r in out.collect()}


def test_cache_ttl_matches_rfc_mirror(spark):
    got = _ttl_rows(spark)
    for i, c in enumerate(CASES):
        assert got[i] == py_ttl(*c), (i, c, got[i])


def test_cache_ttl_session_tz_independent(spark):
    base = _ttl_rows(spark)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert _ttl_rows(spark) == base
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_partial_columns(spark):
    # callers with only a cache-control column pass just that
    df = spark.createDataFrame([("max-age=5",), (None,)], "cc string")
    got = [r.ttl_s for r in
           df.select(recrawl.cache_ttl_s(F.col("cc"))).collect()]
    assert got == [5, None]


# ------------------------------------------------------------- warc side
def _mk_record(url: str, hdrs: dict, body: bytes = b"<p>x</p>") -> bytes:
    http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in hdrs.items())
            + f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    return ("WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n").encode() \
        + http + b"\r\n\r\n"


@pytest.mark.parametrize("gz", [False, True])
def test_warc_http_headers_reader(spark, tmp_path, gz):
    data = (_mk_record("http://a.com/x",
                       {"Cache-Control": "max-age=3600", "Date": D0,
                        "ETag": '"abc"'})
            + _mk_record("http://a.com/y", {"Expires": D1H, "Date": D0})
            + _mk_record("http://a.com/z", {}))
    p = tmp_path / ("h.warc.gz" if gz else "h.warc")
    p.write_bytes(gzip.compress(data) if gz else data)
    got = {r.url: r for r in
           warc.warc_http_headers(spark, str(p)).collect()}
    assert set(got) == {"http://a.com/x", "http://a.com/y",
                        "http://a.com/z"}
    x = got["http://a.com/x"]
    assert (x.cache_control, x.date, x.etag) == \
        ("max-age=3600", D0, '"abc"')
    assert x.expires is None and x.last_modified is None
    y = got["http://a.com/y"]
    assert (y.expires, y.cache_control) == (D1H, None)
    assert all(v is None for v in (got["http://a.com/z"].cache_control,
                                   got["http://a.com/z"].expires))
    # end-to-end: reader columns → ttl
    ttls = warc.warc_http_headers(spark, str(p)).select(
        "url",
        recrawl.cache_ttl_s(F.col("cache_control"), F.col("expires"),
                            F.col("date"), F.col("last_modified")),
    )
    tv = {r.url: r.ttl_s for r in ttls.collect()}
    assert tv == {"http://a.com/x": 3600, "http://a.com/y": 3600,
                  "http://a.com/z": None}


def test_recrawl_due_ttl(spark):
    rates = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00"), ("u2", "2026-01-01 00:00:00"),
         ("u3", "2026-01-01 00:00:00"), ("u4", "2026-01-01 11:59:00")],
        "url string, last_ts string",
    )
    ttls = spark.createDataFrame(
        [("u1", 10), ("u2", 10 ** 9), ("u4", 30)],
        "url string, ttl_s int",
    )
    # now = 12h later; default ttl 1h for u3 (no server signal)
    due = recrawl.recrawl_due_ttl(
        rates, "2026-01-01 12:00:00", ttls, default_ttl_s=3600)
    assert sorted(r.url for r in due.collect()) == ["u1", "u3", "u4"]
    # server says u2 is still fresh; u4's 30 s lapsed at age 60 s
