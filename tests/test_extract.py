"""Byte-identity of the distributed extraction kernel (BASELINE.json
input_hint: "byte-identical extracted text per url").

The ``pages.text`` oracle column is produced at fixture-generation time
by the sequential reference-semantics kernel; here the Arrow-batched
pandas UDF re-extracts from ``html`` on executors and must match
byte-for-byte on every row."""

from pyspark.sql import functions as F

from website_to_agent_spark import extraction, htmlmini
from website_to_agent_spark.functions.extract import extract_udf


def test_extract_udf_byte_identity(spark, pages_df):
    out = (
        pages_df.withColumn("ext", extract_udf(F.col("url"), F.col("html")))
        .select("url", "text", F.col("ext.text").alias("spark_text"))
        .collect()
    )
    assert len(out) > 0
    for row in out:
        assert row.spark_text == row.text, f"text mismatch for {row.url}"


def test_extract_udf_struct_fields(spark, pages_df):
    row = (
        pages_df.withColumn("ext", extract_udf(F.col("url"), F.col("html")))
        .filter(F.col("url").endswith("/p/1.html"))
        .select("url", "ext.*")
        .orderBy("url")
        .first()
    )
    assert row.title.startswith("Title 1")
    assert isinstance(row.keywords, list)
    assert row.markdown.startswith("# Page 1")
    assert all(l.url.startswith("http") or l.url.startswith("ftp")
               or l.url.startswith("mailto") for l in row.links)


def test_selector_cascade_branches():
    html = "<html><body><header>noise</header><main><p>MAIN</p></main></body></html>"
    rec = extraction.extract_page(html, "https://x.test/")
    assert rec["text"] == "MAIN"

    html2 = '<html><body><div class="content"><p>C</p></div></body></html>'
    assert extraction.extract_page(html2, "https://x.test/")["text"] == "C"

    html3 = "<html><body><p>B</p></body></html>"
    assert extraction.extract_page(html3, "https://x.test/")["text"] == "B"

    html4 = "<p>NOBODY</p>"
    assert extraction.extract_page(html4, "https://x.test/")["text"] == "NOBODY"


def test_prune_and_whitespace():
    html = (
        "<html><body><script>bad()</script><style>.x{}</style>"
        "<nav>NAV</nav><main><p>a</p>\n\n\n<p>  b   c </p></main></body></html>"
    )
    rec = extraction.extract_page(html, "https://x.test/")
    assert "bad" not in rec["text"] and "NAV" not in rec["text"]
    assert rec["text"] == "a\nb c"


def test_markdown_branches():
    html = (
        "<html><body><main><h1>T</h1><h3>S</h3><ul><li>i1</li><li></li></ul>"
        "<div><p>inner</p></div><p></p></main></body></html>"
    )
    md = extraction.extract_page(html, "https://x.test/")["markdown"]
    # nested div repeats inner text — faithful to bs4 find_all pre-order
    assert md == "# T\n\n### S\n\n- i1\n\ninner\n\ninner"


def test_entities_and_keywords():
    html = (
        '<html><head><title> A &amp; B </title>'
        '<meta name="description" content=" d ">'
        '<meta name="keywords" content="x, y ,, z "></head>'
        "<body><p>&lt;tag&gt;</p></body></html>"
    )
    rec = extraction.extract_page(html, "https://x.test/")
    assert rec["title"] == "A & B"
    assert rec["description"] == "d"
    assert rec["keywords"] == ["x", "y", "z"]
    assert rec["text"] == "<tag>"


def test_htmlmini_roundtrip():
    html = '<div id="a" class="b c"><p>x &amp; y</p><br><img src="i.png"></div>'
    node = htmlmini.parse(html)
    s = htmlmini.serialize(node)
    assert htmlmini.parse(s).get_text("|", strip=True) == node.get_text("|", strip=True)
