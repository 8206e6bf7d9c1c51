"""Focused pins for the round-7 optimization internals.

Each test pins an equivalence an optimization relies on, independent of the
end-to-end goldens that also cover it:
- the bucket-keyed politeness window equals the plain per-host window and
  plans no exchange of its own above an in-plan bucket repartition;
- integer_pagerank's engine-path caching changes no values and registers
  every persisted frame for the caller's unpersist;
- the element_at+concat n-gram spelling equals the slice+array_join one.
"""

import pyspark.sql.functions as F
import pytest

from frontier_engine.fixtures import T0, FixtureConfig
from frontier_engine.politeness import budgets_df, rank_by_budget
from frontier_engine.xxh import xxhash64_str


def _frontier_df(spark, n=1500):
    fix = FixtureConfig(n_urls=n)
    rows = []
    for i in range(n):
        u = fix.canon_url(i)
        h = xxhash64_str(u)
        h = h - (1 << 64) if h >= (1 << 63) else h
        # host_bucket = pmod(xxhash64(host), 64) — a pure function of host,
        # exactly like scheduler._bucket (the invariant the bucket-keyed
        # window depends on)
        hb = xxhash64_str(fix.host(i)) % 64
        rows.append((u, h, fix.host(i), hb, 100 - (i % 17), T0))
    return spark.createDataFrame(
        rows, "url_canon string, url_hash long, host string, "
        "host_bucket int, priority int, crawl_ts timestamp"
    )


def test_bucketed_window_matches_plain_and_plans_one_exchange(spark):
    """rank_by_budget(bucketed=True) over an in-plan host_bucket
    repartition must (a) produce the SAME rk for every row as the plain
    per-host window — host_bucket is a function of host, so the composite
    partition key cannot change per-host ranks — and (b) satisfy the
    window's distribution with the explicit repartition alone (exactly one
    exchange, no ENSURE_REQUIREMENTS node)."""
    df = _frontier_df(spark)
    budgets = budgets_df(spark, {"host3.example.com": 2})

    plain = rank_by_budget(df, budgets, default_budget=5, salt=1)
    bucketed = rank_by_budget(
        df.repartition(64, "host_bucket"), budgets, default_budget=5,
        salt=1, bucketed=True,
    )

    def rows(r):
        return sorted(
            (x["host"], x["url_hash"], x["rk"], x["budget"]) for x in r.collect()
        )

    assert rows(plain) == rows(bucketed)

    # the only hash exchange is the explicit repartition: the window's
    # ClusteredDistribution(host_bucket, host) is satisfied by it in-plan,
    # so EnsureRequirements inserts nothing (the AQE plan string repeats
    # the tree per stage, so assert on exchange KINDS, not node counts)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    assert "REPARTITION_BY_NUM" in plan, plan


def test_pagerank_tracked_caching_is_value_neutral(spark):
    """integer_pagerank(tracked=list) must return exactly the rows of the
    cache-free call (integer arithmetic — bit-exact), and every frame it
    persisted must be on the tracked list so the scheduler's finally can
    unpersist them (no cache leak across cycles)."""
    from frontier_engine.graph import integer_pagerank

    edges = spark.createDataFrame(
        [(f"h{i % 7}", f"h{(i * 3 + 1) % 7}") for i in range(50)],
        "src string, dst string",
    )
    plain = sorted(map(tuple, integer_pagerank(edges).collect()))
    tracked: list = []
    cached = sorted(map(tuple, integer_pagerank(edges, tracked=tracked).collect()))
    assert plain == cached
    assert len(tracked) == 3  # e, outdeg, hosts
    for df in tracked:
        assert df.storageLevel.useMemory  # actually persisted
        df.unpersist()


@pytest.mark.parametrize("n", [2, 3, 5])
def test_gram_expr_matches_slice_join_spelling(spark, n):
    """The element_at+concat n-gram spelling must emit byte-identical
    shingle arrays to the previous slice+array_join spelling for every
    n in use (2-gram repetition, 3-gram minhash, 5-gram decontamination),
    including the <n-words empty-array edge."""
    from frontier_engine.queries import _gram_expr

    texts = [
        (0, "a b c d e f"),
        (1, "one two"),
        (2, ""),
        (3, "x"),
        (4, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        (5, "dup dup dup dup"),
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string").select(
        "doc_id", F.split("text", " ").alias("_words")
    )
    old = F.expr(
        f"CASE WHEN size(_words) >= {n} THEN "
        f" transform(sequence(1, size(_words) - {n - 1}), "
        f"   i -> array_join(slice(_words, i, {n}), ' ')) "
        "ELSE array() END"
    )
    got = {r["doc_id"]: r["g"] for r in d.select("doc_id", _gram_expr(n).alias("g")).collect()}
    want = {r["doc_id"]: r["g"] for r in d.select("doc_id", old.alias("g")).collect()}
    assert got == want
