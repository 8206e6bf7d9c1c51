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
