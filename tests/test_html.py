"""HTML extraction ops for the webtext payload (functions/html.py):
visible-text extraction, titles, links, meta, canonical, text density —
over realistic messy crawl markup, including the binary html column of
the north-rule table shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_sdk_spark.functions import html as H

PAGE = """<!DOCTYPE html><html><head>
<title> The &amp; Title &#8212; News </title>
<meta name="description" content="A test page">
<meta content="kw1, kw2" name="keywords">
<link rel="canonical" href="https://example.com/canon">
<style>body { color: red; } p::after { content: ">" }</style>
<script type="text/javascript">if (1 < 2) { document.write("<p>junk</p>"); }
</script>
</head><body>
<!-- a comment with <p>markup</p> inside -->
<h1>Heading</h1>
<p>First &quot;paragraph&quot; with a <a href="/rel/path">relative link</a>
and an <a href='https://other.example/abs'>absolute</a> one.</p>
<div>Second   block&nbsp;here</div>
<a href="//cdn.example/pr">protocol-relative</a>
<a href="#frag">fragment</a>
<a href="javascript:void(0)">js</a>
<a href="sub/page.html">doc-relative</a>
</body></html>"""


def _one(spark, col):
    return spark.createDataFrame([(PAGE,)], "h string").select(
        col.alias("v")).first()["v"]


def test_title_entities_and_whitespace(spark):
    assert _one(spark, H.html_title(F.col("h"))) == 'The & Title News'
    # no title -> null, not empty string
    row = spark.createDataFrame([("<p>x</p>",)], "h string").select(
        H.html_title(F.col("h")).alias("t")).first()
    assert row["t"] is None


def test_extract_text_drops_scripts_styles_comments(spark):
    text = _one(spark, H.extract_text(F.col("h")))
    assert "Heading" in text and "First \"paragraph\"" in text
    assert "Second block here" in text  # &nbsp; + space collapse
    assert "color: red" not in text          # style body gone
    assert "document.write" not in text      # script body gone
    assert "junk" not in text                # even markup inside scripts
    assert "comment with" not in text        # comments gone
    assert "<" not in text.replace("1 < 2", "")  # no residual tags
    # block-level structure survives as lines (feeds dedup_lines)
    lines = text.split("\n")
    assert any(ln.strip() == "Heading" for ln in lines)


def test_extract_links_resolution(spark):
    base = F.lit("example.com")
    links = _one(spark, H.extract_links(F.col("h"), base))
    assert links == [
        "https://example.com/rel/path",
        "https://other.example/abs",
        "https://cdn.example/pr",
        "https://example.com/sub/page.html",
    ]
    # without a base host, raw targets come back (fragments/js dropped)
    raw = _one(spark, H.extract_links(F.col("h")))
    assert raw == ["/rel/path", "https://other.example/abs",
                   "//cdn.example/pr", "sub/page.html"]


def test_meta_and_canonical(spark):
    assert _one(spark, H.meta_content(F.col("h"), "description")) == \
        "A test page"
    # inverted attribute order
    assert _one(spark, H.meta_content(F.col("h"), "keywords")) == "kw1, kw2"
    assert _one(spark, H.meta_content(F.col("h"), "absent")) is None
    assert _one(spark, H.canonical_url(F.col("h"))) == \
        "https://example.com/canon"


def test_text_density_orders_article_vs_boilerplate(spark):
    article = "<html><body><p>" + "real words " * 200 + "</p></body></html>"
    navpage = ("<html><body>" + "".join(
        f'<a href="/x{i}">x</a>' for i in range(200)) + "</body></html>")
    df = spark.createDataFrame([(1, article), (2, navpage)],
                               "id int, h string")
    d = {r["id"]: r["d"] for r in df.select(
        "id", H.text_density(F.col("h")).alias("d")).collect()}
    assert d[1] > 0.8 and d[2] < 0.2


def test_binary_html_column_roundtrip(spark):
    """The north-rule table stores html as BINARY — html_to_string
    adapts it, and extraction over the binary column equals extraction
    over the original string (the byte-identical-text-per-url
    invariant's extraction leg)."""
    df = spark.createDataFrame([(PAGE,)], "h string").select(
        "h", F.encode("h", "utf-8").alias("hb"))
    row = df.select(
        H.extract_text(F.col("h")).alias("a"),
        H.extract_text(H.html_to_string(F.col("hb"))).alias("b")).first()
    assert row["a"] == row["b"] and len(row["a"]) > 0


def test_malformed_markup_degrades_gracefully(spark):
    rows = [(1, "<p>unclosed <b>bold"),            # unclosed tags
            (2, "no markup at all"),               # plain text
            (3, "<a href=unquoted>x</a> tail"),    # unquoted attr
            (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "id int, h string")
    got = {r["id"]: r["t"] for r in df.select(
        "id", H.extract_text(F.col("h")).alias("t")).collect()}
    assert got[1] == "unclosed bold"
    assert got[2] == "no markup at all"
    assert "tail" in got[3]
    assert got[4] == "" and got[5] is None
    # link extraction on the unquoted form simply finds nothing (regex
    # targets the quoted 95%), never throws
    n = df.filter("id = 3").select(
        F.size(H.extract_links(F.col("h"))).alias("n")).first()["n"]
    assert n == 0


def test_double_escaped_entities_unescape_one_level(spark):
    """'&amp;' must be the LAST substitution (ADVICE r5): double-escaped
    entities are literal text of a single-escaped entity, never the
    final character — '&amp;lt;' renders as '&lt;', not '<'."""
    rows = [(1, "<p>&amp;lt;tag&amp;gt; and &amp;quot;q&amp;quot;</p>"),
            (2, "<p>&amp;#39;n&amp;#39;</p>"),   # double-escaped numeric
            (3, "<p>a &amp; b &lt; c</p>")]      # normal single escapes
    df = spark.createDataFrame(rows, "id int, h string")
    got = {r["id"]: r["t"] for r in df.select(
        "id", H.extract_text(F.col("h")).alias("t")).collect()}
    assert got[1] == '&lt;tag&gt; and &quot;q&quot;'
    assert got[2] == "&#39;n&#39;"
    assert got[3] == "a & b < c"


def test_extract_links_rfc3986_page_url(spark):
    """Document-relative hrefs resolve against the page's directory
    (RFC 3986 merge: base stripped to the last '/'), not the host root,
    when the page URL is given (VERDICT r5 #8)."""
    page = ('<a href="sub/page.html">r</a>'
            '<a href="/abs">a</a>'
            '<a href="//cdn.x/p">pr</a>'
            '<a href="https://other.x/q">full</a>')
    rows = [(1, page, "https://h.example/a/b.html"),
            (2, page, "https://h.example/a/"),      # dir-form base
            (3, page, "https://h.example"),         # no path slash
            (4, page, "https://h.example/a/b?q=1#f")]  # query/frag gone
    df = spark.createDataFrame(rows, "id int, h string, url string")
    got = {r["id"]: r["l"] for r in df.select("id", H.extract_links(
        F.col("h"), page_url=F.col("url")).alias("l")).collect()}
    assert got[1] == ["https://h.example/a/sub/page.html",
                      "https://h.example/abs",
                      "https://cdn.x/p",
                      "https://other.x/q"]
    assert got[2][0] == "https://h.example/a/sub/page.html"
    assert got[3][0] == "https://h.example/sub/page.html"
    assert got[4][0] == "https://h.example/a/sub/page.html"
    # explicit base_host still wins for authority-level resolution and
    # the host-root fallback stays when only a host is given
    hr = df.filter("id = 1").select(H.extract_links(
        F.col("h"), F.lit("h.example")).alias("l")).first()["l"]
    assert hr[0] == "https://h.example/sub/page.html"
