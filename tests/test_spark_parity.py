"""Driver-side twins vs Spark JVM built-ins, pinned over adversarial inputs.

The golden refspec scheduler recomputes the engine's 64-bit keys and robots
decisions in pure Python; these tests pin the byte-level parity contracts:

1. ``xxh.xxhash64_str`` == ``F.xxhash64`` (string column, seed 42) — the
   claim in frontier_engine/xxh.py's module docstring.
2. ``apply_robots``'s Spark path extraction == ``canon.path_of``'s
   urlsplit semantics (raw spaces and other shapes java.net.URI rejects
   must block identically, round-2 ADVICE).
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frontier_engine.canon import path_of
from frontier_engine.politeness import apply_robots
from frontier_engine.xxh import xxhash64_str

ADVERSARIAL_STRINGS = [
    "",
    "a",
    "abc",
    "1234567",          # 7 bytes (< one 8-byte lane)
    "12345678",         # exactly one lane
    "0123456789abcdef0123456789abcdef",      # exactly 32 (one stripe)
    "0123456789abcdef0123456789abcdef0",     # 33
    "x" * 31,
    "x" * 100,
    "https://example.com/path?a=1&b=2",
    "https://example.com/%7Euser/%2e%2e/x",  # %-escapes
    "naïve-ünïcode-ß",
    "日本語のURLパス",
    "emoji-🎉🎊-mixed",
    "\x00null\x00bytes",
    "tab\tand\nnewline",
    " leading and trailing ",
    "%41%42%43",
]

ADVERSARIAL_URLS = [
    "http://h.com/allowed/x",
    "http://h.com/private/x",
    "http://h.com/private/a b/c",      # raw space: java.net.URI rejects
    "http://h.com/a b",                # raw space, not blocked
    "http://h.com",                    # empty path -> "/"
    "http://h.com?q=1",                # empty path with query
    "http://h.com/private?q=1",        # query cut
    "http://user@h.com/private/x",     # userinfo in authority
    "http://h.com:8080/private/x",     # explicit port
    "mailto:someone@h.com",            # no //authority
    "1http://h.com/private/x",         # invalid scheme -> all path
    "http://h.com/prívate/ünïcode",    # unicode path
    "http://h.com//private/x",         # double slash path
]


def test_xxhash64_parity(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"s": ADVERSARIAL_STRINGS})
    ).withColumn("h", F.xxhash64("s"))
    for r in df.collect():
        py = xxhash64_str(r["s"])
        # Spark returns a signed 64-bit long
        signed = py - (1 << 64) if py >= (1 << 63) else py
        assert signed == r["h"], f"xxh mismatch for {r['s']!r}"


def test_xxhash64_parity_random_unicode(spark):
    import random

    rng = random.Random(42)
    pool = "abc/:%?=&#日本語🎉 \t\x00ß" + "".join(
        chr(rng.randrange(32, 0x2FFF)) for _ in range(50)
    )
    strs = [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame({"s": strs})).withColumn(
        "h", F.xxhash64("s")
    )
    for r in df.collect():
        py = xxhash64_str(r["s"])
        signed = py - (1 << 64) if py >= (1 << 63) else py
        assert signed == r["h"]


def test_robots_path_parity(spark):
    """Spark-side blocked flag == pure-Python (path_of + startswith) for
    every adversarial URL, including shapes java.net.URI can't parse."""
    disallow = ["/private", "/a b"]
    pending = spark.createDataFrame(
        [(u, "h.com") for u in ADVERSARIAL_URLS], "url_canon string, host string"
    )
    robots = spark.createDataFrame(
        [("h.com", disallow)],
        T.StructType(
            [
                T.StructField("host", T.StringType()),
                T.StructField("disallow", T.ArrayType(T.StringType())),
            ]
        ),
    )
    got = {
        r["url_canon"]: r["blocked"]
        for r in apply_robots(pending, robots).collect()
    }
    for u in ADVERSARIAL_URLS:
        want = any(path_of(u).startswith(d) for d in disallow)
        assert got[u] == want, (u, path_of(u), got[u], want)
