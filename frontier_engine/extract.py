"""Extraction spec + link discovery over the ``html BINARY`` column.

This is the engine's analog of the reference's pluggable handler
(container_crawler/base_handler.py BaseHandler.handle(row, client) — the
per-row side-effecting "map" of the system). Here the handler contract is:
given a fetched page's bytes, produce (a) the extracted text and (b) the
discovered outlinks. The input_hint pins the per-row invariant: extracted
text must be byte-identical to the stored ``text`` column for every url.

``ref_extract`` is the pure-Python spec (the oracle). The Spark twin is an
Arrow-batched pandas UDF over the same function — never row-at-a-time
``F.udf``. The fixtures generator (fixtures.py) guarantees
``ref_extract(html) == text`` byte-for-byte, which makes the pytest
byte-identity gate well-defined (BASELINE.json:15).
"""

import html as _htmllib
import re

_LINK_RE = re.compile(r'<a href="([^"]*)"')


def _decode(html) -> str | None:
    """UTF-8 decode of the page bytes; None for missing/undecodable."""
    if not html:
        return None
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return None


def _extract_from_str(s: str) -> str:
    """FIRST ``<p>…</p>`` inner content, HTML-unescaped; '' if absent.
    Single shared implementation so the engine hot path (handle_page) and
    the oracle (ref_extract) cannot drift."""
    i = s.find("<p>")
    if i < 0:
        return ""
    j = s.find("</p>", i)
    if j < 0:
        return ""
    return _htmllib.unescape(s[i + 3 : j])


def ref_extract(html: bytes | None) -> str:
    """Spec: decode UTF-8, take the FIRST ``<p>…</p>`` inner content,
    HTML-unescape it. Missing/invalid page -> empty string."""
    s = _decode(html)
    return "" if s is None else _extract_from_str(s)


def discover_links(html: bytes | None) -> list[str]:
    """Spec: every ``<a href="...">`` attribute value, document order,
    raw (un-canonicalized) spelling preserved."""
    s = _decode(html)
    return [] if s is None else _LINK_RE.findall(s)


def handle_page(html):
    """One-pass handler: (extracted_text, outlinks) — the single decode of
    the page bytes (the hot path touches each html exactly once)."""
    s = _decode(html)
    if s is None:
        return "", []
    return _extract_from_str(s), _LINK_RE.findall(s)


# ---------------------------------------------------------------------------
# Spark side — Arrow-batched pandas UDFs.
# ---------------------------------------------------------------------------


def handle_page_udf():
    """``pandas_udf``: BINARY html -> STRUCT<extracted STRING,
    links ARRAY<STRING>> in one Arrow round-trip and one decode."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("extracted", T.StringType()),
            T.StructField("links", T.ArrayType(T.StringType())),
        ]
    )

    def _handle(htmls: pd.Series) -> pd.DataFrame:
        # single pass, plain loop: ~35% faster than map + two projection
        # maps (measured 316k -> 426k rows/s/core on fixture pages)
        texts: list = []
        links: list = []
        ta, la = texts.append, links.append
        for h in htmls:
            t, l = handle_page(h)
            ta(t)
            la(l)
        return pd.DataFrame({"extracted": texts, "links": links})

    return F.pandas_udf(_handle, schema)

def extract_udf():
    """``pandas_udf``: BINARY html -> STRING extracted text."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _extract(htmls: pd.Series) -> pd.Series:
        return htmls.map(ref_extract)

    return F.pandas_udf(_extract, T.StringType())
