"""HTML → text extraction: known-payload expectations, entity decode
ordering, script/style/comment removal, title extraction, Python
html-module differential on generated fragments, codegen plan."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.functions.html import html_title, html_to_text, strip_tags


def _extract(spark, payloads):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(payloads)), "h": payloads})
    )
    rows = df.select(
        "i",
        html_to_text("h").alias("t"),
        html_title("h").alias("title"),
    ).collect()
    return {r["i"]: (r["t"], r["title"]) for r in rows}


def test_known_payloads(spark):
    got = _extract(spark, [
        "<html><head><title>My  Page</title><style>p{x}</style></head>"
        "<body><script>var a='<p>';</script><p>Hello &amp; welcome</p>"
        "<!-- note --><div>a &lt;b&gt; c&nbsp;d</div></body></html>",
        "no markup at all",
        "<p>unclosed",
        "",
    ])
    assert got[0] == ("My Page Hello & welcome a <b> c d", "My Page")
    assert got[1] == ("no markup at all", "")
    assert got[2] == ("unclosed", "")
    assert got[3] == ("", "")


def test_entity_decode_is_single_level(spark):
    # "&amp;lt;" is the ESCAPED text "&lt;" — must NOT double-decode to "<"
    got = _extract(spark, ["&amp;lt;tag&amp;gt;"])
    assert got[0][0] == "&lt;tag&gt;"


def test_script_style_spanning_lines(spark):
    got = _extract(spark, [
        "<script>\nvar a = 1;\nif (a < 2) {}\n</script>keep"
        "<style>\nbody { color: red }\n</style>me",
    ])
    assert got[0][0] == "keep me"


def test_matches_python_reference(spark):
    """Differential vs an independent Python implementation (regex +
    html.unescape limited to the same core entities)."""
    import re

    def py_extract(h):
        out = re.sub(r"(?is)<script\b[^>]*>.*?</script>", " ", h)
        out = re.sub(r"(?is)<style\b[^>]*>.*?</style>", " ", out)
        out = re.sub(r"(?s)<!--.*?-->", " ", out)
        out = re.sub(r"<[^>]+>", " ", out)
        for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
            out = out.replace(ent, ch)
        return re.sub(r"\s+", " ", out).strip()

    frags = [
        "<b>bold</b> and <i>italic</i>",
        "<a href='x?a=1&amp;b=2'>link</a> tail",
        "text <script src='x'></script><p>para</p>",
        "<TITLE>caps</TITLE><P>Q&amp;A</P>",
        "plain & unescaped ampersand",
        "<div   class='x'\n data-y='1'>attrs\nnewlines</div>",
    ]
    got = _extract(spark, frags)
    for i, h in enumerate(frags):
        assert got[i][0] == py_extract(h), h


def test_strip_tags_keeps_raw_entities(spark):
    df = spark.createDataFrame(pd.DataFrame({"h": ["<p>a &amp; b</p>"]}))
    r = df.select(strip_tags("h").alias("t")).collect()[0]
    assert r["t"] == "a &amp; b"


def test_all_codegen_no_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"h": ["<p>x</p>"]}))
    sdf = df.select(html_to_text("h").alias("t"))
    phys = sdf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


# ---------------------------------------------------------------------------
# URL normalization (functions/url.py)


def _norm(spark, urls):
    from pandasql_spark.functions.url import url_host, url_normalize

    df = spark.createDataFrame(pd.DataFrame({"i": range(len(urls)), "u": urls}))
    rows = df.select(
        "i", url_normalize("u").alias("n"), url_host("u").alias("h")
    ).collect()
    return {r["i"]: (r["n"], r["h"]) for r in rows}


def test_url_normalize_known_cases(spark):
    got = _norm(spark, [
        "HTTP://Example.COM:80/Path/x?b=2&utm_source=x&a=1#frag",
        "https://site.org:443/",
        "https://site.org",
        "http://a.b/p?utm_campaign=z&gclid=1",
        "  http://h/p?z=1&y=2&z=0 ",
        "not a url #tail",
        "http://case.com/KeepPathCase",
        "https://x.io:8443/p",
    ])
    assert got[0] == ("http://example.com/Path/x?a=1&b=2", "example.com")
    assert got[1] == ("https://site.org/", "site.org")
    assert got[2] == ("https://site.org/", "site.org")
    assert got[3] == ("http://a.b/p", "a.b")
    assert got[4] == ("http://h/p?y=2&z=0&z=1", "h")
    assert got[5] == ("not a url", "")
    assert got[6][0] == "http://case.com/KeepPathCase"  # path case kept
    assert got[7] == ("https://x.io:8443/p", "x.io")  # non-default port kept


def test_url_normalize_idempotent_and_variant_collapse(spark):
    variants = [
        "HTTP://A.com:80/x?b=1&a=2#z",
        "http://a.COM/x?a=2&b=1",
        "http://a.com:80/x?utm_source=s&b=1&a=2",
    ]
    got = _norm(spark, variants)
    canon = {v[0] for v in got.values()}
    assert canon == {"http://a.com/x?a=2&b=1"}
    # idempotence: normalizing the canonical form is a fixpoint
    again = _norm(spark, list(canon))
    assert again[0][0] == next(iter(canon))


def test_url_host_skips_userinfo(spark):
    got = _norm(spark, [
        "http://user:pw@site.com/x",
        "https://u@h.org:8443/p",
    ])
    assert got[0][1] == "site.com"
    assert got[1][1] == "h.org"


def test_url_percent_encoding_normalization(spark):
    got = _norm(spark, [
        "http://h.com/p%41th%7e/x",        # unreserved escapes decode
        "http://h.com/a%2fb?q=%2f",        # reserved: hex uppercased only
        "http://h.com/%zz%4",              # malformed escapes pass through
        "http://h.com/%2541",              # %25→'%' is reserved: no double-decode
        "HTT%50://H.com/x",                # escaped scheme byte still canonicalizes
        "http://h.com/p?%75tm_source=t&a=1",  # escaped tracking param dropped
        "http://ex%61mple.COM/x",          # escaped host byte, then lowercased
    ])
    assert got[0][0] == "http://h.com/pAth~/x"
    assert got[1][0] == "http://h.com/a%2Fb?q=%2F"
    assert got[2][0] == "http://h.com/%zz%4"
    assert got[3][0] == "http://h.com/%2541"
    assert got[4][0] == "http://h.com/x"
    assert got[5][0] == "http://h.com/p?a=1"
    assert got[6][0] == "http://example.com/x"
    assert got[6][1] == "example.com"


def test_url_percent_normalization_idempotent(spark):
    urls = [
        "http://h.com/p%41th%7e/x?q=%2f%2E",
        "http://h.com/%zz%4%2541",
    ]
    first = [v[0] for _, v in sorted(_norm(spark, urls).items())]
    second = [v[0] for _, v in sorted(_norm(spark, first).items())]
    assert first == second


def test_url_normalize_userinfo_preserved_and_port_stripped(spark):
    got = _norm(spark, [
        "HTTP://User:PW@Site.com:80/x",
        "http://User:PW@site.com/x",
        "https://U@h.org:443/",
    ])
    # credentials keep their case; scheme/host lowercase; :80 stripped
    assert got[0][0] == "http://User:PW@site.com/x"
    assert got[0] == got[1]  # the two variants collapse
    assert got[0][1] == "site.com"
    assert got[2][0] == "https://U@h.org/"
