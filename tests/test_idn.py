"""IDN/punycode URL normalization (operators/idn.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_to_agent_spark.operators import idn


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i int, url string")
    out = idn.normalize_idn(df)
    return [r.url for r in sorted(out.collect(), key=lambda r: r.i)]


def test_known_ace_forms(spark):
    got = _norm(spark, [
        "http://bücher.example/path?q=1",
        "https://müller.de:8443/a",
        "http://пример.испытание/",
        "http://user:pw@straße.de/x#f",
    ])
    assert got == [
        "http://xn--bcher-kva.example/path?q=1",
        "https://xn--mller-kva.de:8443/a",
        "http://xn--e1afmkfd.xn--80akhbyknj4f/",
        # ß maps per IDNA-2003 nameprep (the stdlib codec): ss
        "http://user:pw@strasse.de/x#f",
    ]
    # cross-check against the stdlib round trip
    assert "bücher".encode("idna").decode() == "xn--bcher-kva"


def test_ascii_and_edge_cases_untouched(spark):
    cases = [
        "http://plain.example.com/a?b=c#d",
        "https://UPPER.example.com/",     # ascii branch: byte-identical
        "http://[2001:db8::1]:8080/v6",
        "not a url at all",
        None,
        "",
        "http://ümlaut.example/ path stays ünicode?q=ö",
    ]
    got = _norm(spark, cases)
    assert got[:6] == cases[:6]
    # host encoded, non-ascii path/query untouched
    assert got[6] == "http://xn--mlaut-jva.example/ path stays ünicode?q=ö"


def test_unencodable_host_passes_through(spark):
    # a label the idna codec rejects (>63 chars after encoding) must
    # pass through unchanged, never fail the task
    bad = "http://" + "ü" + "x" * 62 + ".example/x"
    assert _norm(spark, [bad]) == [bad]


def test_ascii_branch_has_no_python(spark):
    from website_to_agent_spark import plans

    df = spark.createDataFrame([("http://a.com/",)], "url string")
    out = idn.normalize_idn(df)
    tree = plans.explain_str(out).split("== Physical Plan ==")[1] \
        .split("\n\n")[0]
    lines = tree.splitlines()
    # first union child (":- " prefixed) = ascii pass-through: pure
    # codegen, no Arrow/Python eval; the kernel appears exactly once,
    # in the non-ascii branch
    ascii_branch = "\n".join(l for l in lines if l.lstrip().startswith(":"))
    assert "Python" not in ascii_branch
    assert tree.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in tree


def test_frontier_state_unsplit(spark):
    # the operational point: unicode and ACE spellings of one host
    # collapse to one seen/politeness key after normalization
    df = spark.createDataFrame(
        [("http://bücher.example/a",), ("http://xn--bcher-kva.example/b",)],
        "url string")
    from website_to_agent_spark.functions import urlfns
    hosts = idn.normalize_idn(df).select(
        urlfns.host(F.col("url")).alias("h")).distinct()
    assert [r.h for r in hosts.collect()] == ["xn--bcher-kva.example"]
