"""Randomized three-engine parity for RFC 9309 wildcard rule matching.

The round-5 wildcard support compiles each allow/disallow rule to an
anchored regex in THREE dialects that must agree decision-for-decision:

- Python ``re`` via :func:`frontier_engine.robots_rfc.rule_regex` (the
  refspec oracle and the SQL-twin literal builder),
- Java regex via the column-side translation in
  :func:`frontier_engine.politeness.apply_robots` (``rule_rx`` — escapes
  only ``politeness._RX_META``, the Java metachar set, while ``re.escape``
  escapes a superset; the two regex STRINGS differ, the DECISIONS must
  not),
- DuckDB/RE2 ``regexp_matches`` (the driver's oracle engine for
  ``robots_longest_match``).

The committed goldens pin one hand-picked rule set; this fuzz sweeps
hundreds of seeded-random rules full of regex metacharacters (``.+?()[]
{}|^\\-``), multi-``*`` bodies, mid-rule ``$`` (a literal octet — only the
trailing position anchors), empty rules, and tie-length allow/disallow
collisions. A divergence in any dialect is a silently wrong robots
decision at scale, invisible to fixed goldens.
"""

import random
import re

import duckdb
import pytest

from frontier_engine.robots_rfc import decide, rule_match_len, rule_regex

# no space / quote / non-ASCII: RE2 rejects escaped-space escapes that
# re.escape emits, and the engine never sees rules outside the URL octet
# set anyway (robots.txt paths are %-encoded ASCII)
_RULE_CHARS = "ab01/.*$+?()[]{}|-^\\%="
_PATH_CHARS = "ab01/.*$+()[]{}|-^\\%="


def _rand_rule(rng: random.Random) -> str:
    n = rng.randint(0, 8)
    r = "".join(rng.choice(_RULE_CHARS) for _ in range(n))
    if rng.random() < 0.3:
        r += "$"  # exercise the trailing anchor explicitly
    return r


def _rand_path(rng: random.Random) -> str:
    n = rng.randint(1, 10)
    return "/" + "".join(rng.choice(_PATH_CHARS) for _ in range(n))


def _cases(seed: int, n_hosts: int, paths_per_host: int):
    rng = random.Random(seed)
    hosts = []
    for h in range(n_hosts):
        dis = [_rand_rule(rng) for _ in range(rng.randint(0, 5))]
        alw = [_rand_rule(rng) for _ in range(rng.randint(0, 3))]
        # force tie-length collisions sometimes: copy a disallow into allow
        if dis and rng.random() < 0.4:
            alw.append(rng.choice(dis))
        paths = [_rand_path(rng) for _ in range(paths_per_host)]
        # force exact rule-as-path hits so plain prefixes actually match
        for r in dis + alw:
            lit = r.rstrip("$").replace("*", "x")
            if lit.startswith("/") and rng.random() < 0.5:
                paths.append(lit)
        hosts.append((f"h{h}.example", dis, alw, paths))
    return hosts


def test_rule_regex_python_duckdb_parity():
    """Python re vs DuckDB RE2 on the same rule_regex() strings: the SQL
    twin embeds these as literals, so a dialect split here corrupts the
    driver's robots_longest_match oracle."""
    rng = random.Random(20260817)
    con = duckdb.connect()
    checked = matched = 0
    for _ in range(600):
        rule = _rand_rule(rng)
        path = _rand_path(rng)
        rx = rule_regex(rule)
        py = bool(re.match(rx, path))
        dk = con.execute(
            "SELECT regexp_matches(?, ?)", [path, rx]
        ).fetchone()[0]
        assert py == dk, (rule, rx, path, py, dk)
        checked += 1
        matched += py
    assert checked == 600 and 0 < matched < checked  # non-vacuous


def test_rule_match_len_is_regex_consistent():
    """The startswith fast path for plain rules must agree with the regex
    slow path (it is what the pre-wildcard engine used)."""
    rng = random.Random(7)
    hits = 0
    for _ in range(400):
        rule = _rand_rule(rng)
        path = _rand_path(rng)
        want = len(rule) if re.match(rule_regex(rule), path) else 0
        assert rule_match_len(path, rule) == want, (rule, path)
        hits += want > 0
    assert hits > 0


@pytest.mark.parametrize("seed", [1, 2026])
def test_apply_robots_spark_python_fuzz_parity(spark, seed):
    """Spark's column-side rule translation (apply_robots rfc=True) vs the
    pure-Python decide() on seeded-random metachar-heavy rule sets: every
    (host, path) decision must match."""
    from pyspark.sql import functions as F

    from frontier_engine.politeness import apply_robots

    hosts = _cases(seed, n_hosts=12, paths_per_host=10)
    robots = spark.createDataFrame(
        [(h, dis, alw) for h, dis, alw, _ in hosts],
        "host string, disallow array<string>, allow array<string>",
    )
    pending_rows = [
        (h, f"http://{h}{p}", p)
        for h, _dis, _alw, paths in hosts
        for p in paths
    ]
    # one robots-less host: left join must leave it unblocked
    pending_rows.append(("nobody.example", "http://nobody.example/x", "/x"))
    pending = spark.createDataFrame(
        pending_rows, "host string, url_canon string, path string"
    )
    out = {
        (r["host"], r["path"]): r["blocked"]
        for r in apply_robots(pending, robots, rfc=True)
        .select("host", "path", "blocked")
        .collect()
    }
    rules = {h: (dis, alw) for h, dis, alw, _ in hosts}
    n_blocked = 0
    for host, url, path in pending_rows:
        dis, alw = rules.get(host, ([], []))
        want = decide(path, dis, alw)
        assert out[(host, path)] == want, (host, path, dis, alw, want)
        n_blocked += want
    assert 0 < n_blocked < len(pending_rows)  # non-vacuous both ways


def test_prefix_mode_empty_rule_is_no_match(spark):
    """A bare "Disallow:" line parses to the empty-string rule, which RFC
    9309 defines as allow-all. startswith("") is true for every path, so
    without the engine's length guard one empty rule blacked out the whole
    host in prefix mode while rfc mode (match length 0 never wins) and the
    refspec left it unblocked. Pin all three semantics: empty rule = no
    match; real rules on the same host still block."""
    from frontier_engine.politeness import apply_robots

    robots = spark.createDataFrame(
        [
            ("allowall.example", [""], []),
            ("mixed.example", ["", "/private/"], []),
        ],
        "host string, disallow array<string>, allow array<string>",
    )
    pending = spark.createDataFrame(
        [
            ("allowall.example", "http://allowall.example/any/p", "/any/p"),
            ("mixed.example", "http://mixed.example/ok", "/ok"),
            ("mixed.example", "http://mixed.example/private/x", "/private/x"),
        ],
        "host string, url_canon string, path string",
    )
    for rfc in (False, True):
        out = {
            (r["host"], r["path"]): r["blocked"]
            for r in apply_robots(pending, robots, rfc=rfc)
            .select("host", "path", "blocked")
            .collect()
        }
        assert out[("allowall.example", "/any/p")] is False, rfc
        assert out[("mixed.example", "/ok")] is False, rfc
        assert out[("mixed.example", "/private/x")] is True, rfc
    # the pure-Python dialects agree
    assert decide("/any/p", [""], []) is False
    assert any(d and "/any/p".startswith(d) for d in [""]) is False


def test_raw_robots_txt_parse_to_decide_end_to_end(spark):
    """Round-5 verdict #6: RAW robots.txt text — including §2.2.3 wildcard
    rules like ``Disallow: /*.php$`` — flows parse -> decide in ONE Spark
    pipeline: column-side line parsing (split / filter / transform, the
    robots_parse shape, extended to Allow) feeds apply_robots(rfc=True)
    directly, and every decision must equal the pure-Python parse +
    robots_rfc.decide twin. Pins that the wildcard grammar is exercised by
    PARSED-FROM-RAW rules end-to-end, not only by fixture rule arrays."""
    from pyspark.sql import functions as F

    from frontier_engine.politeness import apply_robots

    raw_by_host = {
        "a.example": (
            "User-agent: *\n"
            "Disallow: /*.php$\n"        # the verdict's wildcard rule
            "Allow: /public*.php$\n"     # longer allow beats it under /public
            "Disallow: /private/\n"
            "Disallow: /*sessionid\n"    # query-targeting rule (RFC §2.2.2:
            "# comment\n"                # the match target is path+query)
            "Crawl-delay: 2\n"
        ),
        "b.example": (
            "User-agent: *\n"
            "Disallow:\n"                # bare rule = allow-all (no match)
            "Disallow: /tmp*\n"
            "Allow: /tmp/keep$\n"
        ),
        "c.example": "User-agent: *\n",  # no rules at all
    }
    paths = [
        "/index.php", "/public/x.php", "/public.php", "/x.php?q=1",
        "/private/p", "/privateer", "/tmp/anything", "/tmp/keep",
        "/tmp/keeper", "/", "/safe.html", "/page?sessionid=9",
    ]

    robots_raw = spark.createDataFrame(
        list(raw_by_host.items()), "host string, raw string"
    )
    lines = F.split(F.col("raw"), "\n")

    def directive(prefix):
        return F.transform(
            F.filter(lines, lambda l: l.startswith(prefix)),
            lambda l: F.substring(l, len(prefix) + 1, 100000),
        )

    # a bare "Disallow:" (no trailing space) also parses to the empty rule
    bare_dis = F.when(
        F.exists(lines, lambda l: l == "Disallow:"),
        F.array(F.lit("")),
    ).otherwise(F.array().cast("array<string>"))
    robots = robots_raw.select(
        "host",
        F.concat(directive("Disallow: "), bare_dis).alias("disallow"),
        directive("Allow: ").alias("allow"),
    )

    pending = spark.createDataFrame(
        [
            (h, f"http://{h}{p}", p)
            for h in raw_by_host
            for p in paths
        ],
        "host string, url_canon string, path string",
    )
    got = {
        (r["host"], r["path"]): r["blocked"]
        for r in apply_robots(pending, robots, rfc=True)
        .select("host", "path", "blocked")
        .collect()
    }

    # pure-Python twin: same parse, robots_rfc.decide
    def py_parse(raw):
        dis, alw = [], []
        for line in raw.split("\n"):
            if line.startswith("Disallow: "):
                dis.append(line[len("Disallow: "):])
            elif line == "Disallow:":
                dis.append("")
            elif line.startswith("Allow: "):
                alw.append(line[len("Allow: "):])
        return dis, alw

    n_blocked = 0
    for h, raw in raw_by_host.items():
        dis, alw = py_parse(raw)
        for p in paths:
            want = decide(p, dis, alw)
            assert got[(h, p)] == want, (h, p, dis, alw, want)
            n_blocked += want
    assert 0 < n_blocked < len(got)

    # spot-pin the wildcard semantics themselves (not just parity):
    assert got[("a.example", "/index.php")] is True      # /*.php$ blocks
    # match target is path+QUERY (§2.2.2): the $ anchor sees the query,
    # so /x.php?q=1 does not end in .php — unblocked...
    assert got[("a.example", "/x.php?q=1")] is False
    # ...and a query-targeting rule bites
    assert got[("a.example", "/page?sessionid=9")] is True
    assert got[("a.example", "/public/x.php")] is False  # longer allow wins
    assert got[("a.example", "/privateer")] is False     # prefix needs /
    assert got[("b.example", "/tmp/keep")] is False      # $-anchored allow
    assert got[("b.example", "/tmp/keeper")] is True     # anchor holds
    assert got[("b.example", "/safe.html")] is False     # bare rule inert
    assert got[("c.example", "/index.php")] is False     # ruleless host
