"""Text analysis for web-scale corpora: tokenization, quality scoring,
language id, fingerprinting.

Everything here is a *Column expression builder* — pure JVM-side
``pyspark.sql.functions`` compositions (whole-stage codegen, no Python in
the hot path). Each builder has a DuckDB-SQL twin in ``__spark_entry__``'s
oracles; the expressions are written against the ANSI subset both engines
share (split/filter lambdas, regexp_replace, md5) so results match bit-for-
bit on strings and to 4 decimals on ratios.

The reference has no scalar-function library at all (SURVEY.md §2.7: users
write Scala lambdas in ``map``) — this module is the engine's superset
replacement, per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "at", "this")

PUNCT_CLASS = r"[.,!?;:]"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings removed (split-on-space semantics,
    identical to DuckDB ``list_filter(string_split(t, ' '), x -> x <> '')``)."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are basic punctuation."""
    removed = F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return F.when(F.length(col) > 0,
                  (F.length(col) - removed) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, some stopwords
    (looks like language), not punctuation soup. Deterministic arithmetic
    shared with the DuckDB oracle."""
    n_tok = token_count(col)
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5)
    return F.round((len_term + stop_term + punct_term) / 3.0, 4)


# language id: char-class + stopword n-gram heuristic ----------------------

_LANG_MARKERS = [
    ("zh", r"[一-鿿]"),
    ("ja", r"[぀-ヿ]"),
    ("ru", r"[Ѐ-ӿ]"),
]
_LANG_STOPWORDS = [
    ("de", (" der ", " die ", " und ", " nicht ")),
    ("fr", (" le ", " la ", " les ", " est ")),
    ("es", (" el ", " los ", " que ", " una ")),
]


def lang_id(col: Column) -> Column:
    """Heuristic language id. Script ranges first, then stopword evidence,
    default 'en'. Mirrors classic n-gram LID at the cheapest useful tier."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    expr = F.lit("en")
    for lang, words in reversed(_LANG_STOPWORDS):
        hits = None
        for w in words:
            h = F.when(padded.contains(w), 1).otherwise(0)
            hits = h if hits is None else hits + h
        expr = F.when(hits >= 2, F.lit(lang)).otherwise(expr)
    for lang, pattern in reversed(_LANG_MARKERS):
        expr = F.when(F.regexp_count(col, F.lit(pattern)) > 0,
                      F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_md5(col: Column) -> Column:
    """Stable 64-bit-equivalent content fingerprint (hex prefix of md5) —
    the oracle-checkable fingerprint."""
    return F.substring(F.md5(F.encode(col, "utf-8")), 1, 16)


def fingerprint_rolling(col: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min rolling-hash over ``window``-grams.
    Built from JVM ops: substring n-grams via sequence + transform, hash
    each gram with xxhash64, take the min. (No DuckDB twin — xxhash64 is
    Spark-specific; checked rows-only.)"""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: col.substr(i, F.lit(window)))
    return F.array_min(F.transform(grams, F.xxhash64))


def dup_token_ratio(col: Column) -> Column:
    """Repetition quality signal (the Gopher-rules family: a high
    duplicate-token fraction marks boilerplate/spam): 1 - distinct/total
    tokens; 0.0 for empty docs. Pure array expressions."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n > 0,
                  1.0 - F.size(F.array_distinct(toks)) / n).otherwise(0.0)


def hash_split(key: Column, weights: list[int],
               labels: list[str] | None = None) -> Column:
    """Deterministic train/val/test assignment from a stable key hash:
    bucket = md5(key) mod 100 routed by cumulative ``weights`` (summing to
    100). Content-derived and engine-portable (md5 family, DuckDB twin) —
    the split never changes across runs, cluster sizes, or row order,
    which is what makes held-out sets trustworthy at corpus scale."""
    if sum(weights) != 100:
        raise ValueError("weights must sum to 100")
    labels = labels or [f"split_{i}" for i in range(len(weights))]
    bucket = F.pmod(F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8),
                           16, 10).cast("long"), F.lit(100))
    expr = None
    acc = 0
    for w, lab in zip(weights, labels):
        acc += w
        expr = (F.when(bucket < acc, lab) if expr is None
                else expr.when(bucket < acc, lab))
    return expr.otherwise(labels[-1])


# engine-portable BPE-ish pre-tokenizer: contraction suffixes, letter runs,
# digit runs, non-space symbol runs — the GPT-2 pattern family minus
# lookaheads (RE2/DuckDB has none, so the oracle can replay it exactly)
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+"


def token_count_bpe(col: Column) -> Column:
    """Subword-style token count (whitespace-free, punctuation-aware) —
    the cheap proxy for tokenizer cost accounting over a corpus."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def dedup_lines(col: Column) -> Column:
    """Within-document line dedup (the CCNet/RefinedWeb boilerplate pass:
    nav bars, cookie banners and footers repeat VERBATIM inside a page —
    dropping repeated lines removes them without any cross-doc state).
    Keeps the FIRST occurrence of each line, preserves order, rejoins
    with newlines. Pure JVM array expressions (split -> array_distinct,
    which is first-occurrence-stable in Spark) — zero Python, runs
    embarrassingly parallel per row."""
    return F.array_join(F.array_distinct(F.split(col, "\n")), "\n")


def strip_control_chars(col: Column) -> Column:
    """Remove C0/C1 control characters except tab/newline (mojibake and
    binary-spill cleanup — a standard first pass on crawled text). Pure
    codegen regexp; keeps \\t and \\n because document structure
    (dedup_lines, paragraph logic) depends on them."""
    return F.regexp_replace(
        col, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]", "")


def dup_ngram_ratio(col: Column, n: int = 3) -> Column:
    """Gopher-style repeated-n-gram fraction: 1 - distinct/total word
    n-grams (0.0 when a doc has fewer than n tokens). Complements
    :func:`dup_token_ratio` (unigram) and :func:`line_dup_ratio` (lines):
    phrase-level repetition catches spun/boilerplate text the other two
    miss. Pure array expressions."""
    from .dedup import ngram_set  # local import: dedup imports this module

    toks = tokens(col)
    total = F.size(toks) - (n - 1)
    distinct = F.size(ngram_set(col, n))
    return F.when(total > 0, 1.0 - distinct / total).otherwise(0.0)


# RE2-safe PII patterns (no lookarounds — portable to DuckDB/RE2 oracles)
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ip": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d{1,2}[ .\-]?\(?\d{3}\)?[ .\-]?\d{3}[ .\-]?\d{4}",
              "<PHONE>"),
}


def redact_pii(col: Column, kinds: tuple = ("email", "ip", "phone")) -> Column:
    """Replace common PII shapes (emails, IPv4 addresses, phone numbers)
    with typed placeholder tokens — the standard pre-training scrub pass.
    Pure JVM regexp_replace chain (codegen, zero Python); patterns avoid
    lookarounds so an RE2-based oracle can replay them. A regex pass is
    a SHAPE scrub, not NER — names/addresses need a model-based pass this
    container can't ship (same honesty contract as the multimodal
    decode stub)."""
    out = col
    for kind in kinds:
        pat, tok = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, tok)
    return out


def line_dup_ratio(col: Column) -> Column:
    """Fraction of repeated lines per document — the quality signal
    companion to :func:`dedup_lines` (Gopher/RefinedWeb filter family:
    docs past a threshold are dropped outright instead of cleaned)."""
    lines = F.split(col, "\n")
    n = F.size(lines)
    return F.when(n > 0,
                  1.0 - F.size(F.array_distinct(lines)) / n).otherwise(0.0)


def url_host(col: Column) -> Column:
    """Hostname of a URL column, lowercased — pure JVM
    ``parse_url``-free regex (parse_url is unsupported under ANSI-safe
    replays and throws on malformed URLs; crawl data IS malformed).
    Scheme/userinfo/port/path stripped; bare hosts ('example.com/x')
    handled; null/empty -> null."""
    h = F.regexp_extract(col, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@\s]*@)?([^/:?#\s]+)", 1)
    return F.when(h == "", None).otherwise(F.lower(h))


def registered_domain(col: Column, n_labels: int = 2) -> Column:
    """Last ``n_labels`` host labels ('news.bbc.co.uk' -> 'co.uk' at 2):
    a cheap eTLD+1 approximation WITHOUT a public-suffix list (which this
    container can't ship — same honesty contract as the PII shape scrub).
    Use n_labels=3 for ccTLD-heavy corpora.

    An EXTRACTOR only — a grouping/reporting key. Do NOT compare a
    fixed-depth extraction against a deny list: a real crawl mixes TLD
    depths in one column, so no single ``n_labels`` is right ('bbc.co.uk'
    in a blocklist can never match the depth-2 extraction 'co.uk', while
    blocking 'co.uk' itself would drop the whole UK web). Deny lists go
    through :func:`filter_blocked_domains` / :func:`is_blocked_domain`,
    which match the blocklist against ALL host suffixes — exact for any
    blocklist, no PSL needed."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(host.isNull(), None).when(
        n >= n_labels,
        F.concat_ws(".", F.slice(labels, n - n_labels + 1, n_labels))
    ).otherwise(F.concat_ws(".", labels))


#: deny-list matching compares the blocklist against the host's last k
#: labels for every k up to this depth — deep enough for any real
#: public-suffix + registrable-domain + subdomain entry
MAX_SUFFIX_LABELS = 5


def _suffixes_of_host(host: Column,
                      max_labels: int = MAX_SUFFIX_LABELS) -> Column:
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ks = F.sequence(F.lit(1), F.least(n, F.lit(max_labels)))
    sufs = F.transform(
        ks, lambda k: F.concat_ws(".", F.slice(labels, n - k + 1, k)))
    empty = F.slice(F.split(F.lit(""), ","), 1, 0)  # typed array<string>
    return F.when(host.isNull(), empty).otherwise(sufs)


def host_suffixes(col: Column, max_labels: int = MAX_SUFFIX_LABELS) -> Column:
    """All dot-joined suffixes of a URL's host, shortest first
    ('news.bbc.co.uk' -> ['uk', 'co.uk', 'bbc.co.uk', 'news.bbc.co.uk']),
    capped at ``max_labels`` labels. Null host -> empty array. Pure
    Column algebra (sequence + transform + slice — codegen)."""
    return _suffixes_of_host(url_host(col), max_labels)


def is_blocked_domain(col: Column, blocklist: list[str],
                      max_labels: int = MAX_SUFFIX_LABELS) -> Column:
    """True when ANY suffix of the URL's host appears in ``blocklist``
    (a small literal list — for large lists use
    :func:`filter_blocked_domains`'s broadcast-join form). Suffix
    matching is exact for any blocklist without a public-suffix list:
    'badsite.co.uk' blocks 'x.badsite.co.uk' but never 'bbc.co.uk',
    regardless of TLD depth."""
    bl = F.array(*[F.lit(str(d).lower()) for d in blocklist])
    return F.arrays_overlap(host_suffixes(col, max_labels), bl)


def filter_blocked_domains(df, url_col: str, blocklist,
                           max_labels: int = MAX_SUFFIX_LABELS):
    """Drop rows whose URL host — or ANY parent domain of it — appears in
    ``blocklist`` (a DataFrame with a 'domain' column, or an iterable of
    strings): the crawl-pipeline deny-list pass.

    Matching is against all host suffixes, not a fixed-depth extraction
    (see :func:`registered_domain` for why fixed depth silently breaks
    on ccTLDs) — exact for any blocklist, no public-suffix list needed.

    Scale shape — the corpus body never shuffles and no text moves:

    1. distinct HOSTS (a narrow shuffle of host strings only — a crawl
       has orders of magnitude fewer hosts than pages);
    2. explode each distinct host's <= ``max_labels`` suffixes, semi-join
       the broadcast blocklist -> the set of blocked hosts ACTUALLY
       PRESENT in the corpus;
    3. broadcast LEFT ANTI join the corpus on its host against that set.

    The broadcast in (3) is sound because the matched-host set is
    deny-list-scale: each blocked host has some suffix in the blocklist,
    so its size is (entries) x (distinct subdomains of each present in
    the corpus) — blocklist-bounded for real deny lists. A degenerate
    entry like 'com' would match half the web; that is a misuse of a
    deny list, and step (2)'s count is the cheap place to guard it
    operationally. Rows with unparseable/null hosts are always KEPT
    (null never equals a join key)."""
    from pyspark.sql import DataFrame as _DF

    if not isinstance(blocklist, _DF):
        spark = df.sparkSession
        blocklist = spark.createDataFrame(
            [(str(d).lower(),) for d in blocklist], "domain string")
    bl = blocklist.select(F.lower(F.col("domain")).alias("__suf")).distinct()
    tagged = df.withColumn("__host", url_host(F.col(url_col)))
    blocked_hosts = (
        tagged.select("__host").distinct()
        .select("__host",
                F.explode(_suffixes_of_host(F.col("__host"), max_labels))
                .alias("__suf"))
        .join(F.broadcast(bl), "__suf", "left_semi")
        .select("__host").distinct())
    return (tagged.join(F.broadcast(blocked_hosts), "__host", "left_anti")
            .drop("__host"))
