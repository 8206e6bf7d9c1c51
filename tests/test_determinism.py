"""Determinism across parallelism — the north rule's 'same crawl ordering
and URL-seen set at N and 4N executors' made executable: the SAME job run
at local[2] and local[8] (fresh JVM each, via subprocess) must commit
byte-identical scheduled order, url_seen membership, and lineage."""

import os
import subprocess
import sys

from frontier_engine import schemas
from frontier_engine.fixtures import ensure_fixtures
from tests.conftest import FIXTURE_CACHE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(master: str, fixture: str, workdir: str) -> None:
    out = subprocess.run(
        [
            sys.executable, "-m", "frontier_engine.benchrun",
            "--master", master, "--fixture", fixture,
            "--pages-canon", os.path.join(fixture, "pages_canon"),
            "--cycles", "2", "--default-budget", "12",
            "--keep-workdir", workdir,
        ],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert any(
        l.startswith("BENCHJSON") for l in out.stdout.splitlines()
    ), out.stderr[-2000:]


def _trace(spark, workdir: str):
    from frontier_engine.tableio import TableIO

    io = TableIO(workdir)
    sched = {}
    for k in (1, 2):
        rows = io.read_cycle(spark, "scheduled", k, schemas.SCHEDULED).collect()
        sched[k] = sorted(
            (r["host_bucket"], r["fetch_seq"], r["url_canon"], r["url_hash"],
             r["priority"], r["retries"])
            for r in rows
        )
    seen = sorted(
        r["url_hash"]
        for r in io.read_appended(spark, "url_seen", 2, schemas.URL_SEEN)
        .collect()
    )
    lineage = sorted(
        tuple(r)
        for k in (1, 2)
        for r in io.read_cycle(spark, "lineage", k, schemas.LINEAGE).collect()
    )
    return sched, seen, lineage


def test_same_trace_at_two_parallelism_levels(spark, tmp_path_factory):
    # ensure the fixture AND its bucketed corpus exist (subprocesses only read)
    fixture = ensure_fixtures(FIXTURE_CACHE, 2000)
    if not os.path.exists(os.path.join(fixture, "pages_canon")):
        from frontier_engine.config import EngineConfig
        from frontier_engine.scheduler import prepare_pages
        from frontier_engine.tableio import TableIO

        prepare_pages(
            spark, os.path.join(fixture, "pages.parquet"),
            TableIO(fixture), EngineConfig(),
        )

    w2 = str(tmp_path_factory.mktemp("det-local2"))
    w8 = str(tmp_path_factory.mktemp("det-local8"))
    _run("local[2]", fixture, w2)
    _run("local[8]", fixture, w8)

    t2, t8 = _trace(spark, w2), _trace(spark, w8)
    assert t2[0] == t8[0], "scheduled crawl order differs across parallelism"
    assert t2[1] == t8[1], "url_seen membership differs across parallelism"
    assert t2[2] == t8[2], "lineage differs across parallelism"
    assert len(t2[1]) > 100 and len(t2[0][1]) > 50
