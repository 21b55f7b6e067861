"""HTML processing for crawled web pages — the extraction stage between
the raw ``html`` binary column and the ``text`` column of the webtext
table shape (url, warc_ts, html, text, lang).

Pure Column expression builders (whole-stage codegen, zero Python),
same contract as functions/text.py. A regex pass is a STRUCTURAL
extractor, not a browser: it handles the crawl-pipeline 95% (tags,
scripts/styles, entities, titles, links) and is deterministic — the
property the north rule's byte-identical-text-per-url invariant needs.
Malformed markup degrades gracefully (unclosed tags strip to the next
'>', missing titles yield null) rather than throwing; crawl data IS
malformed. Patterns avoid lookarounds and backreferences so an
RE2-based oracle replay stays possible.

The reference has no HTML handling at all (SURVEY §2.7 — its users map
Scala lambdas); this module is part of the training-data-pipeline
mandate, same tier as text.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# script/style/comment blocks must go BEFORE tag stripping: their BODIES
# are not visible text but contain no enclosing tags once the outer pair
# is removed. Non-greedy bodies; [\s\S] spans newlines without DOTALL.
_BLOCK_RE = (r"(?i)<script[^>]*>[\s\S]*?</script>"
             r"|<style[^>]*>[\s\S]*?</style>"
             r"|<!--[\s\S]*?-->")
_TAG_RE = r"<[^>]*>"

# the handful of entities that dominate real crawl text; numeric forms
# are handled generically for the ASCII range. '&amp;' is deliberately
# ABSENT here — it runs LAST in unescape_entities so double-escaped
# entities unescape one level, not two (ADVICE r5).
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
             ("&nbsp;", " ")]


def html_to_string(col: Column) -> Column:
    """Decode an ``html`` BINARY column to string (UTF-8, invalid bytes
    replaced) — the entry adapter for every builder here when the table
    stores raw bytes. String columns pass through unchanged at the Spark
    type level, so callers can apply it unconditionally."""
    return F.decode(col.cast("binary"), "utf-8")


def unescape_entities(col: Column) -> Column:
    """Replace the common named entities and ASCII numeric character
    references. Chain of codegen ``replace``/``regexp_replace`` — not a
    full HTML5 entity table (honest subset; the long tail is rare in
    crawl text and a full table needs a UDF)."""
    out = col
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    # &#NN; / &#xNN; for printable ASCII: strip the wrapper, keep the
    # char via chr() on the captured code is not expressible in pure
    # SQL — approximate with the two overwhelmingly common ones and
    # drop the rest to a space (better for tokenization than leaving
    # '&#8217;' literals in the text)
    out = F.regexp_replace(out, r"&#x?[0-9a-fA-F]{1,6};", " ")
    # '&amp;' -> '&' must be the FINAL substitution (after the named and
    # numeric passes): double-escaped input like '&amp;lt;' — the literal
    # text '&lt;' — unescapes exactly one level instead of collapsing to
    # '<'. Any oracle replay must mirror this order.
    out = F.replace(out, F.lit("&amp;"), F.lit("&"))
    return out


def html_title(col: Column) -> Column:
    """<title> text, entity-unescaped, whitespace-collapsed; null when
    absent or empty."""
    raw = F.regexp_extract(col, r"(?i)<title[^>]*>([\s\S]*?)</title>", 1)
    t = F.trim(F.regexp_replace(unescape_entities(raw), r"\s+", " "))
    return F.when(t == "", None).otherwise(t)


def extract_text(col: Column) -> Column:
    """Visible text of an HTML document: drop script/style/comment
    blocks, strip tags (block-level tags become newlines so paragraph
    structure survives for dedup_lines/quality), unescape entities,
    collapse runs of spaces, trim. Deterministic — encode/decode
    round-trips of the result are byte-identical, which is what the
    north rule's per-url invariant checks."""
    no_blocks = F.regexp_replace(col, _BLOCK_RE, " ")
    # block-level closers/openers -> newline before generic tag strip
    nl = F.regexp_replace(
        no_blocks,
        r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)[^>]*>",
        "\n")
    no_tags = F.regexp_replace(nl, _TAG_RE, " ")
    unescaped = unescape_entities(no_tags)
    # collapse horizontal whitespace but KEEP newlines (line structure
    # feeds dedup_lines / line_dup_ratio)
    one_space = F.regexp_replace(unescaped, r"[ \t\r\f]+", " ")
    tidy_lines = F.regexp_replace(one_space, r" ?\n ?", "\n")
    squeezed = F.regexp_replace(tidy_lines, r"\n{2,}", "\n")
    # trim() strips only spaces — newlines at the edges need the regex
    return F.regexp_replace(squeezed, r"^\s+|\s+$", "")


def extract_links(col: Column, base_host: Column | None = None,
                  page_url: Column | None = None) -> Column:
    """href targets of <a> tags as an array<string> (document order,
    duplicates kept — the outlink multiset is the signal for link-graph
    work). ``base_host`` (a host string column) resolves scheme-relative
    and absolute-path links onto the page's own host; protocol-relative
    '//x' becomes 'https://x'. Fragment-only and javascript: links are
    dropped.

    ``page_url`` (the page's own absolute URL, e.g. the webtext ``url``
    column) enables RFC 3986 §5.3 merge for document-relative targets:
    'sub/page.html' on 'https://h/a/b.html' resolves to
    'https://h/a/sub/page.html' (base stripped to the last '/'). Without
    it, document-relative targets fall back to the host ROOT — fine for
    the host-level consumers here (link graph, hygiene), wrong for a
    full link inventory; pass ``page_url`` for that. Dot-segment
    normalization ('../') is NOT applied (kept literal — consumers that
    care can post-process; host extraction is unaffected)."""
    hrefs = F.regexp_extract_all(
        col, F.lit(r"""(?i)<a[^>]*\shref\s*=\s*["']([^"'>]+)["']"""), 1)
    hrefs = F.filter(
        hrefs, lambda h: ~(h.startswith("#")
                           | F.lower(h).startswith("javascript:")))
    if base_host is None and page_url is None:
        return hrefs
    if base_host is None:
        # authority of the page URL: scheme://host[:port]
        base_host = F.regexp_extract(page_url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    if page_url is not None:
        # RFC 3986 merge base: page URL stripped to the last '/' of its
        # path (query/fragment removed first). A URL with no path slash
        # after the authority merges against '<scheme>://<host>/'.
        no_qf = F.regexp_extract(page_url, r"^([^?#]*)", 1)
        base_dir = F.when(
            no_qf.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+/"),
            F.regexp_replace(no_qf, r"/[^/]*$", "/")
        ).otherwise(F.concat(F.lit("https://"), base_host, F.lit("/")))
        rel_base = base_dir
    else:
        rel_base = F.concat(F.lit("https://"), base_host, F.lit("/"))
    return F.transform(
        hrefs,
        lambda h: F.when(h.startswith("//"), F.concat(F.lit("https:"), h))
        .when(h.startswith("/"),
              F.concat(F.lit("https://"), base_host, h))
        .when(h.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"), h)
        .otherwise(F.concat(rel_base, h)))


def meta_content(col: Column, name: str) -> Column:
    """content attribute of <meta name="..."> (description, keywords,
    robots, ...); null when absent. Attribute order is handled for the
    dominant name-then-content form plus the content-then-name inverse."""
    pat1 = (r'(?i)<meta[^>]*\sname\s*=\s*["\']' + name
            + r'["\'][^>]*\scontent\s*=\s*["\']([^"\'>]*)["\']')
    pat2 = (r'(?i)<meta[^>]*\scontent\s*=\s*["\']([^"\'>]*)["\']'
            + r'[^>]*\sname\s*=\s*["\']' + name + r'["\']')
    v = F.coalesce(
        F.when(F.regexp_extract(col, pat1, 1) != "",
               F.regexp_extract(col, pat1, 1)),
        F.when(F.regexp_extract(col, pat2, 1) != "",
               F.regexp_extract(col, pat2, 1)))
    return v


def canonical_url(col: Column) -> Column:
    """<link rel="canonical"> href — the dedup key search engines use
    for mirrored pages; null when absent."""
    pat = (r'(?i)<link[^>]*\srel\s*=\s*["\']canonical["\'][^>]*'
           r'\shref\s*=\s*["\']([^"\'>]+)["\']')
    v = F.regexp_extract(col, pat, 1)
    return F.when(v == "", None).otherwise(v)


def text_density(col: Column) -> Column:
    """Visible-text bytes / total HTML bytes, rounded to 4 decimals — the
    classic boilerplate-page signal (index/nav pages score low, article
    pages high). 0.0 for empty documents."""
    total = F.length(col)
    visible = F.length(extract_text(col))
    return F.when(total > 0,
                  F.round(visible / total, 4)).otherwise(F.lit(0.0))
