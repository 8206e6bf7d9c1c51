"""RFC-3986 URL canonicalization — the spec function and its Spark twins.

The reference engine never canonicalizes anything (its row identity is a
sqlite ROWID; see container_crawler/__init__.py Crawler.submit_items); the
north star mandates RFC-3986 canonicalization + 64-bit xxhash keys as the
web-scale generalization of that identity.

Canonical form (the engine-wide spec; refspec.py and the Spark pipeline MUST
agree byte-for-byte — pinned by tests):

1. scheme lowercased
2. host lowercased (IPv6 hosts re-bracketed); userinfo preserved verbatim
3. default ports dropped (http:80, https:443); other ports kept
4. fragment removed
5. path: percent-normalization (rule 7) then RFC 3986 ``remove_dot_segments``;
   empty path becomes ``/``
6. query: split on ``&``, empty params dropped, each param
   percent-normalized, params sorted byte-wise (stable), rejoined with ``&``;
   an empty query drops the ``?``
7. percent-escapes: decode unreserved characters (ALPHA / DIGIT / ``-._~``),
   uppercase the hex of every remaining escape; a bare ``%`` not followed by
   two hex digits is left untouched

The vectorized Spark form is an Arrow-batched pandas UDF wrapping the same
function (input_hint: pandas/Arrow UDFs only, no per-row Python ``F.udf``).
"""

import string
from urllib.parse import urlsplit

_UNRESERVED = set(string.ascii_letters + string.digits + "-._~")
_HEX = set(string.hexdigits)
_DEFAULT_PORT = {"http": 80, "https": 443}


def _norm_pct(s: str) -> str:
    """Decode unreserved %-escapes, uppercase the hex of the rest."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            byte = int(s[i + 1 : i + 3], 16)
            ch = chr(byte)
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:i])
                buf = buf[i:]
    return "".join(output)


def canonicalize(url: str) -> str:
    """Canonicalize one URL per the module spec. Pure, deterministic."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()

    host = parts.hostname or ""
    if ":" in host:  # IPv6 literal — urlsplit strips the brackets
        host = "[" + host + "]"
    userinfo = ""
    if parts.username is not None:
        userinfo = parts.username
        if parts.password is not None:
            userinfo += ":" + parts.password
        userinfo += "@"
    try:
        port = parts.port
    except ValueError:
        port = None
    netloc = userinfo + host
    if port is not None and port != _DEFAULT_PORT.get(scheme):
        netloc += f":{port}"

    path = _remove_dot_segments(_norm_pct(parts.path)) or "/"

    params = [_norm_pct(p) for p in parts.query.split("&") if p != ""]
    params.sort()
    query = "&".join(params)

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


def host_of(url_canon: str) -> str:
    """Host (incl. port if non-default) of an already-canonical URL."""
    return urlsplit(url_canon).netloc.rsplit("@", 1)[-1]


def path_of(url_canon: str) -> str:
    """Path of an already-canonical URL (used for robots prefix matching)."""
    return urlsplit(url_canon).path or "/"


# ---------------------------------------------------------------------------
# Spark side — Arrow-batched pandas UDFs (built lazily so this module stays
# importable without a JVM, e.g. inside refspec/pytest-only runs).
# ---------------------------------------------------------------------------

def canon_udf():
    """``pandas_udf`` canonicalizing a STRING column (Arrow-batched)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _canon(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: canonicalize(u) if u is not None else None)

    return F.pandas_udf(_canon, T.StringType())


def canon_host_udf():
    """``pandas_udf``: raw url STRING -> STRUCT<url_canon, host> in one
    Arrow round-trip (half the Python-boundary cost of two UDFs)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url_canon", T.StringType()),
            T.StructField("host", T.StringType()),
        ]
    )

    def _canon_host(urls: pd.Series) -> pd.DataFrame:
        canons = urls.map(lambda u: canonicalize(u) if u is not None else None)
        hosts = canons.map(lambda c: host_of(c) if c is not None else None)
        return pd.DataFrame({"url_canon": canons, "host": hosts})

    _canon_host = F.pandas_udf(_canon_host, schema)

    return _canon_host


def host_udf():
    """``pandas_udf`` extracting the host of a canonical-URL STRING column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _host(urls):
        return urls.map(lambda u: host_of(u) if u is not None else None)

    return _host
