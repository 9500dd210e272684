"""Unicode normalization (functions/text.py:normalize_unicode /
strip_invisible): NFC composition, invisible-char stripping, ASCII and
NULL passthrough, dedup sensitivity (the VERDICT-r11 motivating bug:
NFD vs NFC twins silently escaping byte-sensitive fingerprints), the
curation-stage composition, and the plan contract (strip stays
codegen; only the NFC kernel is the documented Arrow crossing).

Every non-ASCII codepoint is an explicit escape -- raw invisible or
combining characters in source are exactly the trap this operator
exists to close."""
from __future__ import annotations

import unicodedata

from pandasql_spark.functions.text import normalize_unicode, strip_invisible

NFD = "cafe\u0301 latte"   # e + combining acute
NFC = "caf\u00e9 latte"    # precomposed e-acute


def test_nfc_composition_and_strip(spark):
    rows = [
        (1, "cafe\u0301 zero\u200bwidth soft\u00adhyphen ctrl\x01x A\u030a"),
        (2, "caf\u00e9 zerowidth softhyphen ctrlx \u00c5"),
        (3, "plain ascii text"),
        (4, None),
        (5, "tabs\tand\nnewlines survive"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r.n
        for r in df.select("id", normalize_unicode("t").alias("n")).collect()
    }
    assert got[1] == got[2] == "caf\u00e9 zerowidth softhyphen ctrlx \u00c5"
    assert got[3] == "plain ascii text"
    assert got[4] is None
    assert got[5] == "tabs\tand\nnewlines survive"  # tab/newline kept


def test_strip_invisible_class(spark):
    s = (
        "a\u200b\u200c\u200d\u2060\ufeff\u00adb"
        "\x00\x08\x0b\x0c\x0e\x1f\x7f\x9fc"
    )
    df = spark.createDataFrame([(s,)], "t string")
    got = df.select(strip_invisible("t").alias("n")).collect()[0].n
    assert got == "abc"


def test_strip_false_keeps_invisibles(spark):
    df = spark.createDataFrame([("a\u200bb",)], "t string")
    got = df.select(
        normalize_unicode("t", strip=False).alias("n")
    ).collect()[0].n
    assert got == "a\u200bb"  # NFC alone never removes ZWSP


def test_dedup_sensitivity(spark):
    """The motivating bug: the same paragraph in NFD vs NFC (or with a
    smuggled ZWSP) escapes exact_dedup; after normalize_unicode the
    twins collapse to one fingerprint."""
    from pandasql_spark.operators.dedup import exact_dedup

    rows = [(1, NFD), (2, NFC), (3, "caf\u00e9 la\u200btte")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert exact_dedup(df).count() == 3  # byte-sensitive: all distinct
    norm = df.withColumn("text", normalize_unicode("text"))
    assert exact_dedup(norm).count() == 1


def test_matches_python_unicodedata(spark):
    """Differential vs CPython's unicodedata over assorted scripts --
    the same library the kernel uses, exercised through the full
    Spark/Arrow round-trip (non-BMP survives code-unit handling)."""
    samples = [
        "A\u030angstro\u0308m",       # combining ring + diaeresis
        "\u1e69",                      # s with dot below and above
        "s\u0323\u0307",              # same, decomposed
        "\uac00",                      # Hangul syllable
        "\u1100\u1161",               # same, decomposed jamo
        "\U0001f600 emoji \U00010400",  # non-BMP passthrough
        "\u00c5\u212b",               # A-ring and Angstrom sign
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, t string"
    )
    got = {
        r.id: r.n
        for r in df.select(
            "id", normalize_unicode("t", strip=False).alias("n")
        ).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == unicodedata.normalize("NFC", s), repr(s)


def test_curation_stage_composition(spark):
    """unicode_normalize=True collapses NFD/NFC twin docs inside
    curate_corpus's exact-dedup stage; default off is byte-identical
    to the raw pipeline."""
    from pandasql_spark.operators.curation import curate_corpus

    body = " ".join(f"w{i}" for i in range(10))
    rows = [(1, f"{NFD} {body}"), (2, f"{NFC} {body}"), (3, body)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = curate_corpus(df, min_tokens=1)
    assert raw.count() == 3
    norm = curate_corpus(df, min_tokens=1, unicode_normalize=True)
    out = norm.select("doc_id", "text").collect()
    assert sorted(r.doc_id for r in out) == [1, 3]  # keep lowest id
    assert all("\u0301" not in r.text for r in out)


def test_plan_contract(spark):
    """strip_invisible alone is pure codegen (no Python); the NFC
    kernel is exactly ONE Arrow-batched eval, nothing per-row."""
    from pandasql_spark.plans.explain import explain_str, operator_names

    df = spark.createDataFrame([("x",)], "t string")
    strip_plan = explain_str(df.select(strip_invisible("t")))
    assert "ArrowEval" not in strip_plan and "BatchEvalPython" not in strip_plan
    norm = df.select(normalize_unicode("t"))
    assert "BatchEvalPython" not in explain_str(norm)  # never row-at-a-time
    ops = operator_names(norm)
    assert ops.count("ArrowEvalPython") == 1
