"""Unicode repair (webtext.fix_text): mojibake round-trip, NFC/NFKC,
control/zero-width hygiene, and the corpus-pipeline wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import corpus, webtext


def _fix(spark, texts, form="NFC"):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, t string")
    out = df.select("i", webtext.fix_text(F.col("t"), form=form)
                    .alias("f")).collect()
    return [r.f for r in sorted(out, key=lambda r: r.i)]


def _sloppy_chr(b: int) -> str:
    # the browser mis-decode: cp1252 where defined, raw byte otherwise
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)


def mojibake(s: str, times: int = 1) -> str:
    for _ in range(times):
        s = "".join(_sloppy_chr(b) for b in s.encode("utf-8"))
    return s


def test_mojibake_repair(spark):
    # '”' exercises the undefined-cp1252-slot byte 0x9d
    cases = ["café déjà vu", "it’s “quoted” — right", "naïve Ünïcode"]
    got = _fix(spark, [mojibake(c) for c in cases])
    assert got == cases


def test_mojibake_beside_clean_unicode(spark):
    # a clean CJK/emoji tail must not block repairing the fragment
    raw = mojibake("résumé") + " 漢字 ok"
    assert _fix(spark, [raw]) == ["résumé 漢字 ok"]


def test_double_mojibake_repair(spark):
    # doubly mis-decoded text exists in real crawls; two passes max
    s = "déjà"
    assert _fix(spark, [mojibake(s, times=2)]) == [s]


def test_legitimate_text_untouched(spark):
    # uppercase 'Ã' in real words matches the signature but fails the
    # strict round-trip — must pass through byte-identical
    cases = ["SÃO PAULO", "maçã Ã berlin", "plain ascii text"]
    assert _fix(spark, cases) == cases


def test_normalization_forms(spark):
    decomposed = "école"            # é as e + combining acute
    assert _fix(spark, [decomposed]) == ["école"]
    assert _fix(spark, ["ﬁle Ａ１"], form="NFKC") == ["file A1"]
    # NFC keeps compatibility chars as-is
    assert _fix(spark, ["ﬁle"], form="NFC") == ["ﬁle"]
    with pytest.raises(ValueError):
        webtext.fix_text(F.col("t"), form="NFX")


def test_control_and_space_hygiene(spark):
    raw = "a\x00b\x07c\td\ne f\u200bg\ufeffh"
    assert _fix(spark, [raw]) == ["abc\td\ne fgh"]
    assert _fix(spark, [None, ""]) == [None, ""]


def test_all_in_one(spark):
    raw = mojibake("l\u2019\u00e9t\u00e9") + " x\x01y\u200c"
    assert _fix(spark, [raw]) == ["l\u2019\u00e9t\u00e9 xy"]


def test_map_only_plan(spark):
    df = spark.createDataFrame([("x",)], "t string")
    plan = df.select(webtext.fix_text(F.col("t"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_pipeline_stage(spark):
    docs = spark.createDataFrame(
        [(i, mojibake(f"clean fluent document text number {i} it’s fine"))
         for i in range(6)],
        "doc_id int, text string",
    )
    out, report = corpus.build_training_corpus(
        docs, fix_unicode=True, scrub_pii=False, gopher_gate=False,
        near_dup=False)
    assert report["fix_unicode"] == report["input"] == 6
    stages = list(report)
    assert stages.index("fix_unicode") == 1  # right after input
    texts = [r.text for r in out.collect()]
    assert all("’" in t and "Ã" not in t for t in texts)
