"""url_seen consolidation ("compaction"): with compact_every=2, a 4-cycle
run must produce the exact same trace as refspec AND the url_seen read path
must switch to base+delta form."""

import dataclasses

from frontier_engine import schemas
from frontier_engine.config import config_for_fixture
from frontier_engine.fixtures import FixtureConfig
from frontier_engine.golden import build_engine, diff_traces, ref_trace, spark_trace
from frontier_engine.refspec import read_fixture_rows, run


def test_compacted_seen_matches_refspec(spark, tiny_fixture_dir, tmp_path_factory):
    fix = FixtureConfig(n_urls=2000)
    cfg = dataclasses.replace(config_for_fixture(fix), compact_every=2)
    work = str(tmp_path_factory.mktemp("engine-compact"))
    eng = build_engine(spark, tiny_fixture_dir, work, cfg)
    eng.run(cycles=4)

    # compaction actually happened: manifests 2 and 4 carry url_seen_base
    m2, m4 = eng.io.manifest(2), eng.io.manifest(4)
    assert "url_seen_base" in m2["tables"]
    assert "url_seen_base" in m4["tables"]

    # the consolidated read equals the raw delta union
    base_read = eng.io.read_appended(spark, "url_seen", 4, schemas.URL_SEEN)
    deltas = [
        eng.io.read_cycle(spark, "url_seen", c, schemas.URL_SEEN)
        for c in range(1, 5)
    ]
    raw = deltas[0]
    for d in deltas[1:]:
        raw = raw.unionByName(d)
    assert sorted(r["url_hash"] for r in base_read.collect()) == sorted(
        r["url_hash"] for r in raw.collect()
    )

    # resolved history is consolidated too (R16 status pruning analog)
    assert "resolved_base" in m4["tables"]
    res_read = eng.io.read_appended(spark, "resolved", 4, schemas.RESOLVED)
    res_raw = eng.io.read_cycle(spark, "resolved", 1, schemas.RESOLVED)
    for c in range(2, 5):
        res_raw = res_raw.unionByName(
            eng.io.read_cycle(spark, "resolved", c, schemas.RESOLVED)
        )
    assert sorted(
        (r["cycle"], r["url_hash"], r["state"]) for r in res_read.collect()
    ) == sorted(
        (r["cycle"], r["url_hash"], r["state"]) for r in res_raw.collect()
    )

    st = spark_trace(spark, eng.io, range(1, 5))
    pages, seeds, robots = read_fixture_rows(tiny_fixture_dir)
    rt = ref_trace(run(pages, seeds, robots, cfg, cycles=4))
    assert diff_traces(st, rt) == []
