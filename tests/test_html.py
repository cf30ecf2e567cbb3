"""HTML text-extraction / link-harvest function family."""

from __future__ import annotations

from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.functions import html as H

PAGE = """
<!DOCTYPE html>
<html><head>
  <title> Graph &amp; Data   News </title>
  <style>p { color: red; }</style>
  <script>var x = "<b>not text</b>";</script>
</head>
<body>
  <!-- a comment with <tags> inside -->
  <nav><a href="/skip">navigation</a></nav>
  <header>site header</header>
  <p>Hello &lt;world&gt; &amp; friends.</p>
  <div>Nested <span>spans &quot;quoted&quot;</span> here.</div>
  <a href="https://other.example/abs">abs</a>
  <a href='/root-rel/page'>root</a>
  <a href="sibling.html">sib</a>
  <a href="../up/one">up</a>
  <a href="//cdn.example/lib.js">proto</a>
  <a href="#frag">frag-only</a>
  <a href="">empty</a>
  <footer>copyright</footer>
</body></html>
"""


def _one(spark, col):
    return spark.createDataFrame([(PAGE,)], ["html"]).select(col.alias("v")).first()["v"]


def test_html_text_strips_noise_decodes_collapses(spark):
    text = _one(spark, H.html_text(F.col("html")))
    assert text == 'Hello <world> & friends. Nested spans "quoted" here. abs root sib up proto frag-only empty'
    # boilerplate retained when asked
    kept = _one(spark, H.html_text(F.col("html"), boilerplate=False))
    assert kept.startswith("navigation site header Hello")
    assert "copyright" in kept
    # script/style/comment content never leaks either way
    for noise in ("not text", "color: red", "a comment"):
        assert noise not in kept


def test_html_title(spark):
    assert _one(spark, H.html_title(F.col("html"))) == "Graph & Data News"
    assert _one(spark, H.html_title(F.lit("<p>no title</p>"))) == ""


def test_extract_hrefs_order_and_filters(spark):
    # nav link included (href harvest is structural, not boilerplate-
    # aware); fragment-only and empty dropped
    assert _one(spark, H.extract_hrefs(F.col("html"))) == [
        "/skip",
        "https://other.example/abs",
        "/root-rel/page",
        "sibling.html",
        "../up/one",
        "//cdn.example/lib.js",
    ]


def test_resolve_href_cases(spark):
    base = "https://site.example/a/b/page.html"
    cases = {
        "https://other.example/abs": "https://other.example/abs",
        "mailto:x@example.com": "mailto:x@example.com",
        "//cdn.example/lib.js": "https://cdn.example/lib.js",
        "/root-rel/page": "https://site.example/root-rel/page",
        "sibling.html": "https://site.example/a/b/sibling.html",
        "../up/one": "https://site.example/a/up/one",
        "../../up/two": "https://site.example/up/two",
        "./here": "https://site.example/a/b/here",
        "#frag": base,
        "": base,
    }
    df = spark.createDataFrame(
        [(base, h) for h in cases], ["base", "href"]
    ).select("href", H.resolve_href(F.col("base"), F.col("href")).alias("got"))
    got = {r.href: r.got for r in df.collect()}
    assert got == cases
    # base with no path: directory is origin + '/'
    df2 = spark.createDataFrame([("https://site.example", "x.html")], ["base", "href"])
    assert (
        df2.select(H.resolve_href(F.col("base"), F.col("href")).alias("v")).first()["v"]
        == "https://site.example/x.html"
    )
    # ../ above the root cannot climb past the host
    df3 = spark.createDataFrame(
        [("https://site.example/a/", "../../b")], ["base", "href"]
    )
    assert (
        df3.select(H.resolve_href(F.col("base"), F.col("href")).alias("v")).first()["v"]
        == "https://site.example/b"
    )


def test_link_graph_edges(spark):
    pages = spark.createDataFrame(
        [
            ("https://s.example/a/", '<a href="b.html">b</a><a href="/c">c</a>'),
            # self-link dropped, duplicate edge deduped
            (
                "https://s.example/x",
                '<a href="/x">self</a><a href="/c">c</a><a href="/c">c2</a>',
            ),
        ],
        ["url", "html"],
    )
    got = {
        (r.src_url, r.dst_url) for r in H.link_graph(pages).collect()
    }
    assert got == {
        ("https://s.example/a/", "https://s.example/a/b.html"),
        ("https://s.example/a/", "https://s.example/c"),
        ("https://s.example/x", "https://s.example/c"),
    }


def test_html_text_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([(PAGE,)], ["html"]).select(
        H.html_text(F.col("html")).alias("t"),
        H.html_title(F.col("html")).alias("ti"),
        H.extract_hrefs(F.col("html")).alias("links"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF anywhere in the chain


def test_normalize_unicode_forms(spark):
    from webpagesgraphdatabase_spark import functions as fn

    # input: 'e' + combining acute U+0301, fi-ligature U+FB01
    denorm = "cafe\u0301 \ufb01n"
    df = spark.createDataFrame(
        [(denorm,), (None,)], ["t"]
    ).select(
        fn.normalize_unicode(F.col("t"), "NFC").alias("nfc"),
        fn.normalize_unicode(F.col("t"), "NFKC").alias("nfkc"),
        fn.normalize_unicode(F.col("t"), "NFD").alias("nfd"),
    )
    rows = df.collect()
    assert rows[0].nfc == "caf\u00e9 \ufb01n"  # precomposed, ligature kept
    assert rows[0].nfkc == "caf\u00e9 fin"  # ligature folded too
    assert rows[0].nfd == denorm  # already fully decomposed
    assert rows[1].nfc is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        fn.normalize_unicode(F.col("t"), "NFX")


def test_resolve_href_column_equals_py_twin(spark):
    """One Spark job pins the codegen resolver == the driver twin the
    fuzz suite exercises, over a case matrix including the host-eating
    regression (../../ above the root)."""
    cases = [
        ("https://host.example/", "../../a"),
        ("https://host.example/a/b/c/p.html", "../../../x"),
        ("https://host.example/a/", "../b/../c"),
        ("https://h.example/x", "./y/./z"),
        ("https://h.example/a/b/", "c/../d"),
        ("https://h.example", "p"),
        ("https://h.example/q#f", "#frag"),
    ]
    df = spark.createDataFrame(cases, ["base", "href"]).select(
        "base", "href",
        H.resolve_href(F.col("base"), F.col("href")).alias("got"),
    )
    for r in df.collect():
        assert r.got == H.resolve_href_py(r.base, r.href), (r.base, r.href)
