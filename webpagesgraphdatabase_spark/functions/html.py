"""HTML text extraction and link harvesting — pure Column algebra.

The reference's product is a *webpages* graph database: its pipeline
fetches pages over HTTP and hands raw markup to an LLM
(``main.py:85-98``, content truncation at ``main.py:44-48``). This
module supplies the deterministic half of that step — visible-text
extraction, title extraction, boilerplate removal, href harvesting and
resolution — so a 100 TB crawl can be reduced to text/links without a
model call, and the link graph can be rebuilt from stored markup.

Everything here is a chain of built-in ``regexp_replace`` /
``replace`` / ``regexp_extract_all`` expressions: JVM-side,
whole-stage-codegen, zero UDFs, stream-safe, and engine-portable (the
patterns avoid backreferences and lookaround so the same chain runs on
RE2 — the DuckDB oracle executes the identical transforms).

Honest scope notes:
- Entity decoding covers the named/numeric forms that dominate real
  markup (``&amp; &lt; &gt; &quot; &#39; &apos; &nbsp; &#34;``);
  arbitrary ``&#NNN;`` code points would need a per-row compute and
  stay out of the codegen path.
- ``href`` values are matched in single- or double-quoted form;
  unquoted attributes (invalid per HTML5 serialization but seen in
  the wild) are skipped.
- This is a text extractor, not an HTML5 tree parser: pathological
  markup (a literal ``</script>`` inside a script string) ends the
  element early, exactly as the regex reads it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: elements whose *content* is never visible text (head = document
#: metadata; its title is served separately by :func:`html_title`)
_NOISE_ELEMENTS = ("head", "script", "style", "noscript", "template")
#: boilerplate elements a curation pipeline drops before quality/dedup
_BOILERPLATE_ELEMENTS = ("nav", "footer", "header", "aside")

#: (search, replace) pairs, longest-first with ``&amp;`` LAST so the
#: double-escaped form decodes one level per pass, like html.unescape
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

_HREF_PATTERN = "(?is)<a\\s[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']"
_TITLE_PATTERN = "(?is)<title[^>]*>(.*?)</title>"


def _element_pattern(name: str) -> str:
    # no backreferences (RE2-portable): one pattern per element name
    return f"(?is)<{name}\\b[^>]*>.*?</{name}\\s*>"


def strip_noise(col: Column, boilerplate: bool = True) -> Column:
    """Remove comments and non-content elements (script/style/
    noscript/template; plus nav/footer/header/aside when
    ``boilerplate``) from raw markup."""
    out = F.regexp_replace(col, "(?s)<!--.*?-->", " ")
    names = _NOISE_ELEMENTS + (_BOILERPLATE_ELEMENTS if boilerplate else ())
    for name in names:
        out = F.regexp_replace(out, _element_pattern(name), " ")
    return out


def decode_entities(col: Column) -> Column:
    """Decode the common HTML entities (see module scope note)."""
    for search, repl in _ENTITIES:
        col = F.replace(col, F.lit(search), F.lit(repl))
    return col


def collapse_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, "\\s+", " "))


def html_text(col: Column, boilerplate: bool = True) -> Column:
    """Visible text of an HTML document: noise/boilerplate elements
    and comments dropped, tags replaced by spaces, entities decoded,
    whitespace collapsed."""
    out = strip_noise(col, boilerplate=boilerplate)
    out = F.regexp_replace(out, "<[^>]*>", " ")
    return collapse_ws(decode_entities(out))


def html_title(col: Column) -> Column:
    """Content of the first ``<title>`` element ('' when absent),
    entity-decoded and whitespace-collapsed."""
    return collapse_ws(decode_entities(F.regexp_extract(col, _TITLE_PATTERN, 1)))


def extract_hrefs(col: Column) -> Column:
    """Quoted ``href`` targets of anchor elements, in document order;
    empty and pure-fragment targets dropped."""
    raw = F.regexp_extract_all(col, F.lit(_HREF_PATTERN), F.lit(1))
    return F.filter(raw, lambda h: (h != "") & ~h.startswith("#"))


#: dot-segment collapse passes; 4 bounded passes resolve ../../../..
#: chains 4 deep — beyond that the residual literal segs survive
#: (documented bound, identical in both engines)
_DOT_PASSES = 4


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve ``href`` against ``base`` (RFC 3986 merge, bounded
    dot-segment removal): absolute URLs pass through,
    ``//host/p`` inherits the scheme, ``/p`` the origin, ``p`` the
    base directory; bare fragments resolve to the base itself."""
    scheme = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", 1)
    has_path = F.regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/", 0) != ""
    basedir = F.when(has_path, F.regexp_replace(base, "[^/]*$", "")).otherwise(
        F.concat(origin, F.lit("/"))
    )
    merged = (
        F.when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(href.startswith("#") | (href == ""), base)
        .otherwise(F.concat(basedir, href))
    )
    for _ in range(_DOT_PASSES):
        merged = F.regexp_replace(merged, "://([^/]+)/\\.\\./", "://$1/")
        # the leading char guard ([^/:]) keeps this from eating the
        # HOST when a /../ sits directly after the origin (that case
        # belongs to the pattern above) — found by the urljoin fuzz
        merged = F.regexp_replace(merged, "([^/:])/[^/.][^/]*/\\.\\./", "$1/")
        merged = F.regexp_replace(merged, "/\\./", "/")
    return merged


def link_graph(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) edge list harvested from stored markup —
    the input the reference's graph build takes from its crawler.

    Scale shape: href extraction and resolution are row-local codegen;
    the only shuffle is the final ``distinct`` on the edge key, which
    is exactly the dedup a 100 TB crawl needs anyway (AQE coalesces
    the post-shuffle partitions)."""
    src = F.col(url_col)
    return (
        pages.select(
            src.alias("src_url"),
            F.explode(extract_hrefs(F.col(html_col))).alias("href"),
        )
        .select("src_url", resolve_href(F.col("src_url"), F.col("href")).alias("dst_url"))
        .filter(F.col("dst_url") != F.col("src_url"))
        .distinct()
    )


def resolve_href_py(base: str, href: str) -> str:
    """Driver-local twin of :func:`resolve_href` (same regex chain,
    same bounded dot-segment passes) — exists so the property suite
    can fuzz resolution against ``urllib.parse.urljoin`` cheaply and a
    single Spark job can pin Column ≡ twin."""
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):", base)
    scheme = m.group(1) if m else ""
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", base)
    origin = m.group(1) if m else ""
    has_path = bool(_re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/", base))
    basedir = _re.sub(r"[^/]*$", "", base) if has_path else origin + "/"
    if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", href):
        merged = href
    elif href.startswith("//"):
        merged = scheme + ":" + href
    elif href.startswith("/"):
        merged = origin + href
    elif href.startswith("#") or href == "":
        merged = base
    else:
        merged = basedir + href
    for _ in range(_DOT_PASSES):
        merged = _re.sub(r"://([^/]+)/\.\./", r"://\1/", merged)
        merged = _re.sub(r"([^/:])/[^/.][^/]*/\.\./", r"\1/", merged)
        merged = _re.sub(r"/\./", "/", merged)
    return merged
