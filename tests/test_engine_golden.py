"""End-to-end golden tests: the Spark engine's trace (crawl order, URL-seen
set, per-bucket lineage) must EXACTLY equal the single-threaded refspec over
multiple cycles — the BASELINE.json:2 correctness gate."""

import os

import pytest

from frontier_engine.config import config_for_fixture
from frontier_engine.fixtures import FixtureConfig
from frontier_engine.golden import (
    build_engine,
    diff_traces,
    ref_trace,
    spark_trace,
)
from frontier_engine.refspec import read_fixture_rows, run


@pytest.fixture(scope="module")
def golden(spark, tiny_fixture_dir, tmp_path_factory):
    """Run 3 cycles on Spark and refspec over the n=2000 fixture."""
    fix = FixtureConfig(n_urls=2000)
    cfg = config_for_fixture(fix)
    work = str(tmp_path_factory.mktemp("engine"))

    eng = build_engine(spark, tiny_fixture_dir, work, cfg)
    results = eng.run(cycles=3)
    st = spark_trace(spark, eng.io, range(1, 4))

    pages, seeds, robots = read_fixture_rows(tiny_fixture_dir)
    rt = ref_trace(run(pages, seeds, robots, cfg, cycles=3))
    return st, rt, eng, results


def test_trace_matches_refspec(golden):
    st, rt, _, results = golden
    assert all(r.scheduled_rows > 0 for r in results)
    probs = diff_traces(st, rt)
    assert probs == [], "\n".join(probs)


def test_url_seen_exact(golden):
    st, rt, _, _ = golden
    assert st["seen"] == rt["seen"]
    assert len(st["seen"]) > 50  # seeds + discoveries admitted


def test_filter_equivalence(spark, tiny_fixture_dir, golden, tmp_path_factory):
    """Cuckoo/bloom prefilter must not change ANY output — it only changes
    cost (exact-confirm design, SURVEY.md §2.3)."""
    fix = FixtureConfig(n_urls=2000)
    import dataclasses

    cfg_off = dataclasses.replace(
        config_for_fixture(fix), use_seen_filter=False
    )
    work = str(tmp_path_factory.mktemp("engine-nofilter"))
    eng = build_engine(spark, tiny_fixture_dir, work, cfg_off)
    eng.run(cycles=3)
    st_off = spark_trace(spark, eng.io, range(1, 4))
    st_on, _, _, _ = golden
    assert diff_traces(st_on, st_off) == []


def test_resume_identical_continuation(
    spark, tiny_fixture_dir, golden, tmp_path_factory
):
    """Kill after cycle 2, resume from the snapshot, cycle 3 must be
    identical to the uninterrupted run (north_rule: resumable)."""
    fix = FixtureConfig(n_urls=2000)
    cfg = config_for_fixture(fix)
    work = str(tmp_path_factory.mktemp("engine-resume"))

    eng = build_engine(spark, tiny_fixture_dir, work, cfg)
    eng.run(cycles=2)

    # a fresh scheduler instance (fresh "process") resumes from the manifest
    eng2 = build_engine(spark, tiny_fixture_dir, work, cfg)
    assert eng2.io.latest_cycle() == 2
    eng2.run(cycles=1)  # auto-continues at cycle 3

    st = spark_trace(spark, eng2.io, range(1, 4))
    full, _, _, _ = golden
    assert diff_traces(st, full) == []


def test_extraction_byte_identity(spark, tiny_fixture_dir, golden):
    """BASELINE.json:15 per-row invariant: UDF-extracted text equals the
    stored text column byte-for-byte for EVERY url."""
    from pyspark.sql import functions as F

    from frontier_engine.extract import extract_udf, ref_extract

    _, _, eng, _ = golden
    pc = eng._pages_canon()
    n_bad = (
        pc.withColumn("extracted", extract_udf()(F.col("html")))
        .where(F.col("extracted") != F.col("text"))
        .count()
    )
    assert n_bad == 0
    # and the pure-Python oracle agrees on a sample
    for r in pc.orderBy("url_hash").limit(20).collect():
        assert ref_extract(r["html"]) == r["text"]
