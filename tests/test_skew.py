"""Skew handling: 30% of URLs on one host (the skew fixture). Salting +
AQE must keep results EXACTLY equal to the refspec golden trace — salt is a
physical knob only."""

import dataclasses
import os

from frontier_engine.config import config_for_fixture
from frontier_engine.fixtures import FixtureConfig, ensure_fixtures
from frontier_engine.golden import build_engine, diff_traces, ref_trace, spark_trace
from frontier_engine.refspec import read_fixture_rows, run
from tests.conftest import FIXTURE_CACHE


def test_skewed_host_with_salting(spark, tmp_path_factory):
    fix_dir = ensure_fixtures(FIXTURE_CACHE, 2000, skew=True)
    fix = FixtureConfig(n_urls=2000, skew=True)
    cfg = dataclasses.replace(config_for_fixture(fix), salt_factor=4)

    work = str(tmp_path_factory.mktemp("engine-skew"))
    eng = build_engine(spark, fix_dir, work, cfg)
    eng.run(cycles=2)
    st = spark_trace(spark, eng.io, range(1, 3))

    pages, seeds, robots = read_fixture_rows(fix_dir)
    rt = ref_trace(run(pages, seeds, robots, cfg, cycles=2))
    assert diff_traces(st, rt) == []

    # the hot bucket exists: host0 holds ~30% of the frontier
    sizes = {}
    for lin in rt["lineage"].values():
        for b, d in lin.items():
            sizes[b] = sizes.get(b, 0) + d["rows_scanned"]
    assert max(sizes.values()) > 0.25 * sum(sizes.values())

    # salted write split the hot bucket across multiple files
    sched_dir = os.path.join(work, "scheduled", "cycle=1")
    per_bucket_files = {}
    for dirpath, _dirs, files in os.walk(sched_dir):
        n = len([f for f in files if f.endswith(".parquet")])
        if "host_bucket=" in dirpath and n:
            per_bucket_files[dirpath] = n
    assert max(per_bucket_files.values()) > 1


def test_auto_salt_picks_salt_from_observed_skew(spark, tmp_path_factory):
    """cfg.auto_salt derives the physical salts per cycle from the previous
    cycle's observed hottest-host share (manifest meta): the n=20000 skew
    fixture (30% of URLs on host1) accumulates a deep hot-host frontier
    under its politeness budget, so salting must turn ON (salt > 1) once
    the depth floor is crossed — without any static salt config — and the
    trace must stay byte-identical to refspec (salt is physical only;
    refspec has no salt concept)."""
    fix_dir = ensure_fixtures(FIXTURE_CACHE, 20000, skew=True)
    fix = FixtureConfig(n_urls=20000, skew=True)
    cfg = dataclasses.replace(
        config_for_fixture(fix),
        auto_salt=True, salt_factor=1, politeness_salt=1,
    )

    work = str(tmp_path_factory.mktemp("engine-autosalt"))
    eng = build_engine(spark, fix_dir, work, cfg)
    eng.run(cycles=3)

    salts = {
        k: eng.io.manifest(k)["meta"]["auto_salt"] for k in range(1, 4)
    }
    assert salts[1] == 1  # no history yet
    assert salts[3] > 1, salts  # hot-host depth observed -> salted
    assert all(s <= 16 for s in salts.values())

    st = spark_trace(spark, eng.io, range(1, 4))
    pages, seeds, robots = read_fixture_rows(fix_dir)
    rt = ref_trace(run(pages, seeds, robots, cfg, cycles=3))
    assert diff_traces(st, rt) == []

    # and an unskewed corpus must keep salting OFF (no pointless pre-pass):
    # at n=2000 the hottest host never crosses the 8x-budget depth floor
    plain_dir = ensure_fixtures(FIXTURE_CACHE, 2000)
    plain_cfg = dataclasses.replace(
        config_for_fixture(FixtureConfig(n_urls=2000)),
        auto_salt=True, salt_factor=1, politeness_salt=1,
    )
    work2 = str(tmp_path_factory.mktemp("engine-autosalt-plain"))
    eng2 = build_engine(spark, plain_dir, work2, plain_cfg)
    eng2.run(cycles=2)
    assert eng2.io.manifest(2)["meta"]["auto_salt"] == 1


def test_auto_salt_deterministic_across_resume(spark, tmp_path_factory):
    """The auto-salt decision reads only COMMITTED manifest meta, so a
    split run (2 cycles, fresh scheduler, 1 more) must pick the same salts
    and produce the same trace as an uninterrupted 3-cycle run."""
    fix_dir = ensure_fixtures(FIXTURE_CACHE, 20000, skew=True)
    fix = FixtureConfig(n_urls=20000, skew=True)
    cfg = dataclasses.replace(
        config_for_fixture(fix),
        auto_salt=True, salt_factor=1, politeness_salt=1,
    )

    work_a = str(tmp_path_factory.mktemp("autosalt-straight"))
    eng_a = build_engine(spark, fix_dir, work_a, cfg)
    eng_a.run(cycles=3)

    work_b = str(tmp_path_factory.mktemp("autosalt-resume"))
    eng_b = build_engine(spark, fix_dir, work_b, cfg)
    eng_b.run(cycles=2)
    eng_b2 = build_engine(spark, fix_dir, work_b, cfg)  # fresh scheduler
    eng_b2.run(cycles=1)  # resumes at cycle 3

    for k in range(1, 4):
        ma = eng_a.io.manifest(k)["meta"]
        mb = eng_b2.io.manifest(k)["meta"]
        assert ma["auto_salt"] == mb["auto_salt"], k
        assert ma["host_depth_max"] == mb["host_depth_max"], k
    assert diff_traces(
        spark_trace(spark, eng_a.io, range(1, 4)),
        spark_trace(spark, eng_b2.io, range(1, 4)),
    ) == []


def test_two_phase_window_bounds_task_rows(spark):
    """The exact politeness window must never see more than salt*budget rows
    of one host — phase 1 of rank_by_budget prunes the hot host's frontier
    before the host-partitioned window (the round-1 skew scale-killer) —
    and the scheduled set must be IDENTICAL to the single-window result."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from frontier_engine.config import EngineConfig
    from frontier_engine.fixtures import T0
    from frontier_engine.politeness import budgets_df, rank_by_budget
    from frontier_engine.xxh import xxhash64_str

    cfg = EngineConfig()
    salt, budget = cfg.politeness_salt, cfg.default_budget
    assert salt > 1  # the default posture is skew-safe

    # synthetic skewed frontier: 30% of 2000 URLs on one hot host
    fix = FixtureConfig(n_urls=2000, skew=True)
    rows = []
    for i in range(2000):
        u = fix.canon_url(i)
        h = xxhash64_str(u)
        rows.append(
            (u, h - (1 << 64) if h >= (1 << 63) else h, fix.host(i),
             100 - (i % 17), T0)
        )
    df = spark.createDataFrame(
        rows, "url_canon string, url_hash long, host string, "
        "priority int, crawl_ts timestamp"
    )
    hot = df.groupBy("host").count().agg(F.max("count")).collect()[0][0]
    assert hot > salt * budget  # the hot host actually needs pruning

    budgets = budgets_df(spark, {})
    # phase-1 survivor bound == the exact window's max per-host input
    pre = Window.partitionBy(
        "host", F.pmod(F.col("url_hash"), F.lit(salt))
    ).orderBy(F.desc("priority"), F.asc("crawl_ts"), F.asc("url_hash"))
    surv = (
        df.withColumn("_r1", F.row_number().over(pre))
        .where(F.col("_r1") <= budget)
        .groupBy("host").count().agg(F.max("count")).collect()[0][0]
    )
    assert surv <= salt * budget < hot

    def sched(ranked):
        return sorted(
            (r["host"], r["url_hash"], r["rk"])
            for r in ranked.where(F.col("rk") <= F.col("budget")).collect()
        )

    one = sched(rank_by_budget(df, budgets, budget, salt=1))
    two = sched(rank_by_budget(df, budgets, budget, salt=salt))
    assert one == two and len(one) > 0
