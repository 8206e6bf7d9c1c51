"""Property-based canonicalization tests (hypothesis): idempotence, scheme/
host case-insensitivity, fragment-insensitivity, query-order-insensitivity,
and xxh64 python/spec self-consistency."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from frontier_engine.canon import canonicalize
from frontier_engine.xxh import xxh64

_host_label = st.text(
    alphabet=string.ascii_letters + string.digits + "-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))

_path_seg = st.text(
    alphabet=string.ascii_letters + string.digits + "._~%-", min_size=0,
    max_size=8,
)

_qkey = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=4)
_qval = st.text(alphabet=string.ascii_letters + string.digits, max_size=4)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=3)))
    case_host = "".join(
        c.upper() if draw(st.booleans()) else c for c in host
    )
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_path_seg, max_size=4))
    path = "/" + "/".join(segs) if segs else ""
    params = draw(
        st.lists(st.tuples(_qkey, _qval), max_size=4)
    )
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    url = f"{scheme}://{case_host}{port}{path}"
    if query:
        url += "?" + query
    return url + frag, params


@settings(max_examples=300, deadline=None)
@given(urls())
def test_idempotent_and_invariances(u):
    url, params = u
    c = canonicalize(url)
    # idempotent
    assert canonicalize(c) == c
    # fragment never survives
    assert "#" not in c
    # scheme + host lowercased
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    hostpart = rest.split("/", 1)[0]
    assert hostpart == hostpart.lower()
    # query params sorted byte-wise
    if "?" in c:
        q = c.split("?", 1)[1]
        parts = q.split("&")
        assert parts == sorted(parts)


@settings(max_examples=200, deadline=None)
@given(urls())
def test_query_order_insensitive(u):
    url, params = u
    if "?" not in url or "#" in url:
        return
    base, q = url.split("?", 1)
    parts = q.split("&")
    assert canonicalize(base + "?" + "&".join(reversed(parts))) == canonicalize(url)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**64 - 1))
def test_xxh64_total_and_stable(data, seed):
    h = xxh64(data, seed)
    assert 0 <= h < 2**64
    assert xxh64(data, seed) == h


@settings(max_examples=100, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=30))
def test_canon_host_frame_matches_spec(batch):
    """The vectorized batch canonicalizer (canon_host_frame's C-speed fast
    path + spec fallback) must be byte-identical to the pure spec function
    on every row."""
    import pandas as pd

    from frontier_engine.canon import canon_host_frame, host_of

    raw = [u for u, _params in batch]
    got = canon_host_frame(pd.Series(raw, dtype=object))
    for u, c, h in zip(raw, got["url_canon"], got["host"]):
        assert c == canonicalize(u), u
        assert h == host_of(c), u


def test_canon_host_frame_adversarial():
    """Hand-picked shapes around every fast-path boundary condition."""
    import pandas as pd

    from frontier_engine.canon import canon_host_frame, host_of

    cases = [
        None,
        "https://h.com/p/1?a=1&b=2",        # already canonical (fast)
        "https://h.com/p/1?b=2&a=1",        # 2 params unsorted (fast repair)
        "HTTPS://H.com/p/1?b=2&a=1#frag",   # case + fragment (fast repair)
        "https://h.com/p?a=1&b=2&c=3",      # 3 params (slow)
        "https://h.com/p?a=1&",             # empty param (slow)
        "https://h.com/p?",                 # bare ? (slow)
        "https://h.com/p?x",                # 1 param (fast)
        "https://h.com",                    # empty path (slow)
        "https://h.com:443/p",              # default port (slow)
        "https://h.com:8080/p",             # explicit port (slow)
        "https://u:pw@h.com/p",             # userinfo (slow)
        "https://h.com/a/./b/../c",         # dot segments (slow)
        "https://h.com/.well-known/x",      # dotfile path (conservative slow)
        "https://h.com/p/%41%7e?x=%2F",     # %-escapes (slow)
        "https://h.com/a b/c",              # raw space (slow)
        "https://h.com//double/slash",
        "https://h.com/p?b=2&b=2",          # equal params
        "https://h.com/p?日本=語&a=1",       # unicode params
        "https://h.com/p#",                 # empty fragment
        " https://h.com/p",                 # leading space (slow, strip)
    ]
    got = canon_host_frame(pd.Series(cases, dtype=object))
    for u, c, h in zip(cases, got["url_canon"], got["host"]):
        if u is None:
            assert c is None or pd.isna(c)
            continue
        assert c == canonicalize(u), (u, c, canonicalize(u))
        assert h == host_of(c), u


def test_canon_host_frame_hostile_hrefs_dropped():
    """Non-fetchable or malformed hrefs must yield (None, None) — one
    hostile discovered href must not kill the whole pandas-UDF task, and
    relative / scheme-relative / non-http spellings must not mint
    degenerate shared identities ('://page2.html') that pass ingest's
    NULL-drop filter. Refspec mirrors the drop (same ValueError path)."""
    import pandas as pd

    from frontier_engine.canon import canon_host_frame

    hostile = [
        "http://[junk", "http://[::1", "https://[abc]def/p",  # urlsplit err
        "page2.html",                   # relative href — no base resolution
        "/abs/path",                    # host-relative href
        "//h.com/p",                    # scheme-relative href
        "mailto:user@example.com",      # non-fetchable scheme w/ host-y path
        "ftp://h.com/p",                # non-http scheme
        "javascript:void(0)",           # pseudo-scheme
        "http:///no-host",              # empty host
        "http://h.com:99999/x",         # out-of-range port
        "http://h.com:8a/x",            # non-numeric port
        "",                             # empty href
    ]
    good = "https://ok.com/p"
    got = canon_host_frame(pd.Series(hostile + [good], dtype=object))
    for i in range(len(hostile)):
        assert got["url_canon"][i] is None and got["host"][i] is None
    assert got["url_canon"][len(hostile)] == good
