"""RFC 9309 rule matching with wildcards — pure Python, NO pyspark imports.

RFC 9309 §2.2.3: inside an allow/disallow rule path, ``*`` matches any
sequence of characters (including none) and a TRAILING ``$`` anchors the
end of the match target; a ``$`` anywhere else is a literal octet (the
common parser behavior — the RFC reserves only the trailing position).
Rule precedence (§2.2.2) is by octet count of the RULE string (wildcards
count), allow winning length ties. The match TARGET callers pass as
``path`` is the URI's path PLUS optional ``?query`` (§2.2.2 strips only
scheme, authority and fragment; rules like ``/*sessionid`` exist to hit
query params — canon.path_query_of builds it).

Three consumers share these semantics: the refspec oracle (refspec.py, this
module keeps it pyspark-free), the driver query's SQL-twin builder
(queries.q_robots_longest_match embeds ``rule_regex`` output as literals in
both engines), and the Spark engine's column-expression translation
(politeness.apply_robots mirrors ``rule_regex`` in built-in functions on the
rule-dim side — parity pinned by the wildcard golden test).
"""

import re

# regex metacharacters escaped by the Spark column translation
# (politeness._RX_META) — everything Java-regex-significant EXCEPT ``*``,
# which is converted to ``.*`` instead. re.escape escapes a superset
# (all non-alphanumerics), which matches identically.
SPARK_ESC_CLASS = r"([.^$+?(){}\[\]\\|])"


def rule_regex(rule: str) -> str:
    """Anchored regex for an RFC 9309 rule path, identical semantics across
    Python re, Java (Spark rlike/regexp_like), and DuckDB regexp_matches:
    ``^`` + escaped-body with ``*`` -> ``.*`` + (``$`` iff the rule ends
    with ``$``)."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(seg) for seg in body.split("*"))
    return "^" + pat + ("$" if anchored else "")


def rule_match_len(path: str, rule: str) -> int:
    """Octet count of ``rule`` if it matches ``path`` per RFC 9309, else 0.
    Plain rules (no ``*``, no trailing ``$``) short-circuit to the
    startswith fast path — byte-for-byte the pre-wildcard behavior."""
    if "*" not in rule and not rule.endswith("$"):
        return len(rule) if path.startswith(rule) else 0
    return len(rule) if re.match(rule_regex(rule), path) else 0


def decide(path: str, disallow, allow) -> bool:
    """True iff ``path`` is BLOCKED: longest matching rule wins, allow wins
    length ties, no match means allowed."""
    ld = max((rule_match_len(path, d) for d in disallow), default=0)
    la = max((rule_match_len(path, a) for a in allow), default=0)
    return ld > la
