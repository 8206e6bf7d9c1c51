"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.001 and compare against its oracle_sql() via DuckDB — row count,
column names, and order-insensitive values."""

import math
import os
from datetime import datetime

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_from_spark(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def _rows_from_duckdb(con, sql):
    res = con.sql(sql)
    cols = list(res.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [
        tuple(_norm(row[i]) for i in order) for row in res.fetchall()
    ]
    return sorted(cols), sorted(rows, key=repr)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return c


def _registry():
    """REGISTRY (driver-shipped) + SUBSUMED (consolidated variants): the
    local oracle sweep covers BOTH, so consolidating an operator out of
    the driver artifact never un-verifies it locally."""
    from frontier_engine.queries import REGISTRY, SUBSUMED

    return {**REGISTRY, **SUBSUMED}


def test_registry_fits_driver_artifact():
    """Round-4 verdict #1/#10: the driver's CORRECTNESS artifact holds only
    the registry's first DRIVER_ARTIFACT_CAP entries — a larger registry
    silently un-verifies the tail. Guard the cap so a future addition must
    consolidate (REGISTRY slot per unique operator, variants in SUBSUMED)
    rather than push an operator past the cut."""
    from frontier_engine.queries import (
        DRIVER_ARTIFACT_CAP,
        REGISTRY,
        SUBSUMED,
    )

    assert len(REGISTRY) <= DRIVER_ARTIFACT_CAP, (
        f"REGISTRY has {len(REGISTRY)} entries; the driver artifact keeps "
        f"only the first {DRIVER_ARTIFACT_CAP} — move variants to SUBSUMED"
    )
    assert not set(REGISTRY) & set(SUBSUMED)


@pytest.mark.parametrize(
    "name", [n for n, (_f, sql) in _registry().items() if sql is not None]
)
def test_query_matches_oracle(spark, con, name):
    fn, sql = _registry()[name]
    sdf = fn(spark, SF_DIR)
    scols, srows = _rows_from_spark(sdf)
    dcols, drows = _rows_from_duckdb(con, sql)
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: rowcount {len(srows)} != {len(drows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:5]}"


def test_oracle_queries_have_driver_hashable_schemas(spark):
    """The driver canonicalizes results via pandas sort_values, which throws
    TypeError on list/map-valued cells. Guard every oracle-checked query
    against exposing a top-level ArrayType/MapType column (the round-2
    `robots_parse` driver error) — serialize arrays (array_join) instead."""
    from pyspark.sql.types import ArrayType, MapType

    offenders = []
    for name, (fn, sql) in _registry().items():
        if sql is None:
            continue
        for f in fn(spark, SF_DIR).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"driver-unhashable columns: {offenders}"


@pytest.mark.parametrize(
    "name", [n for n, (_f, sql) in _registry().items() if sql is None]
)
def test_rows_only_queries_run(spark, name):
    fn, _ = _registry()[name]
    df = fn(spark, SF_DIR)
    # > 0, not >= 0: every rows-only entry must produce rows at sf0.01
    # (an empty frame from a broken join/filter passed the old tautology)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_ann_corpus_topk_matches_python_recompute(spark):
    """Exact local oracle for the rows-only ann_corpus_topk entry: the
    within-cell cosine top-3 over the engine's committed ann_index table
    must equal a pure-Python recompute from the same committed rows."""
    import math

    from frontier_engine import schemas
    from frontier_engine.queries import _entry_engine, q_ann_corpus_topk

    got = sorted(
        (r["qid"], r["url_hash"], r["cos_sim"], r["rk"])
        for r in q_ann_corpus_topk(spark, SF_DIR).collect()
    )
    assert len(got) > 0

    eng = _entry_engine(spark)
    last = eng.io.latest_cycle()
    assert last >= 2  # whole-corpus: the snapshot spans multiple cycles
    assert "ann_index_base" in eng.io.manifest(2)["tables"]
    rows = [
        (r["url_hash"], r["cell"], list(r["emb"]))
        for r in eng.io.read_appended(
            spark, "ann_index", last, schemas.ANN_INDEX
        ).collect()
    ]
    # non-vacuity: the corpus genuinely spans cycles (cycle 1 alone is less)
    c1_n = eng.io.read_cycle(spark, "ann_index", 1, schemas.ANN_INDEX).count()
    assert 0 < c1_n < len(rows)
    base = [
        (h, c, e, math.sqrt(sum(x * x for x in e)))
        for h, c, e in rows
        if sum(x * x for x in e) > 0
    ]
    queries = sorted(base)[:3]
    want = []
    for qid, qcell, qe, qn in queries:
        scored = []
        for h, c, e, n in base:
            if c != qcell or h == qid:
                continue
            dot = 0.0
            for x, y in zip(e, qe):
                dot += x * y
            scored.append((h, dot / (n * qn)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rk, (h, cos) in enumerate(scored[:3], start=1):
            want.append((qid, h, cos, rk))
    want = sorted(want)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert abs(g[2] - round(w[2], 6)) < 2e-6, (g, w)


def test_ann_corpus_multiprobe_matches_python_recompute(spark):
    """Exact local oracle for the rows-only ann_corpus_multiprobe entry:
    top-5 cosine over the union of the query's own cell and its N_HYPER
    Hamming-1 cells must equal a pure-Python recompute from the same
    committed ann_index rows."""
    import math

    from frontier_engine import schemas
    from frontier_engine.corpus import N_HYPER
    from frontier_engine.queries import (
        _entry_engine,
        q_ann_corpus_multiprobe,
    )

    got = sorted(
        (r["qid"], r["url_hash"], r["cos_sim"], r["rk"])
        for r in q_ann_corpus_multiprobe(spark, SF_DIR).collect()
    )
    assert 0 < len(got) <= 5

    eng = _entry_engine(spark)
    rows = [
        (r["url_hash"], r["cell"], list(r["emb"]))
        for r in eng.io.read_appended(
            spark, "ann_index", eng.io.latest_cycle(), schemas.ANN_INDEX
        ).collect()
    ]
    base = [
        (h, c, e, math.sqrt(sum(x * x for x in e)))
        for h, c, e in rows
        if sum(x * x for x in e) > 0
    ]
    qid, qcell, qe, qn = sorted(base)[0]
    probes = {qcell ^ m for m in [0] + [1 << j for j in range(N_HYPER)]}
    scored = []
    for h, c, e, n in base:
        if c not in probes or h == qid:
            continue
        dot = sum(x * y for x, y in zip(e, qe))
        scored.append((h, dot / (n * qn)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    want = sorted(
        (qid, h, round(cos, 6), rk)
        for rk, (h, cos) in enumerate(scored[:5], start=1)
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert abs(g[2] - w[2]) < 2e-6, (g, w)


def test_url_hash_keys_duckdb_udf_oracle(spark):
    """Exact local oracle for the driver's rows-only url_hash_keys entry:
    register the pure-Python xxhash64 twin (xxh.xxhash64_str, verified
    against Spark's xxhash64 elsewhere) as a DuckDB scalar UDF and compare
    every column — the driver stays rows-only (no portable SQL for
    xxhash64), but locally the check is exact."""
    import duckdb

    from frontier_engine.xxh import xxhash64_str

    fn, _ = _registry()["url_hash_keys"]
    srows = sorted(
        tuple(r) for r in fn(spark, SF_DIR)
        .select("doc_id", "url_canon", "url_hash", "host_bucket")
        .collect()
    )
    c = duckdb.connect()
    c.create_function("xxh64", lambda s: xxhash64_str(s),
                      ["VARCHAR"], "BIGINT")
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    drows = sorted(
        tuple(r)
        for r in c.sql(
            """
            WITH u AS (
              SELECT doc_id,
                'https://host' || (doc_id % 20) || '.example.com/d/' || doc_id
                  AS url_canon
              FROM documents)
            SELECT doc_id, url_canon, xxh64(url_canon) AS url_hash,
                   CAST(((xxh64(url_canon) % 64) + 64) % 64 AS INT)
                     AS host_bucket
            FROM u
            """
        ).fetchall()
    )
    assert srows == drows


def test_crawl_schedule_c1_matches_refspec_exact(spark):
    """Exact local oracle for the rows-only crawl_schedule_c1 entry (the
    flagship): schema, row count, and EVERY row (bucket, fetch_seq order,
    url/hash/host/priority/timestamp/retries) must equal the pure-Python
    refspec's cycle-1 scheduled batch on the same fixture — the strongest
    pin available for a query whose tables DuckDB cannot see. (Documented
    decision per round-3 verdict item 10: the batch is deterministic given
    the fixture, so the refspec IS the DuckDB-equivalent oracle here.)"""
    import os

    from pyspark.sql import functions as F

    from frontier_engine.config import config_for_fixture
    from frontier_engine.fixtures import FixtureConfig, ensure_fixtures
    from frontier_engine.queries import REPO, q_crawl_schedule_c1
    from frontier_engine.refspec import read_fixture_rows, run

    df = q_crawl_schedule_c1(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "host_bucket", "fetch_seq", "url_canon", "url_hash", "host",
        "priority", "crawl_ts", "retries",
    ]
    got = sorted(
        (r["host_bucket"], r["fetch_seq"], r["url_canon"], r["url_hash"],
         r["host"], r["priority"], r["ts_us"], r["retries"])
        for r in df.withColumn("ts_us", F.unix_micros("crawl_ts"))
        .drop("crawl_ts")
        .collect()
    )

    fix_dir = ensure_fixtures(os.path.join(REPO, ".fixtures"), 2000)
    cfg = config_for_fixture(FixtureConfig(n_urls=2000))
    pages, seeds, robots = read_fixture_rows(fix_dir)
    res = run(pages, seeds, robots, cfg, cycles=1)
    want = sorted(
        (b, seq, url_canon, url_hash, host, priority, ts_us, retries)
        for b, lst in res.scheduled[1].items()
        for seq, (url_canon, url_hash, host, priority, ts_us, retries,
                  _planned_us) in enumerate(lst, start=1)
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_approx_distinct_users_within_hll_error_of_exact(spark, con):
    """Bounded local oracle for the rows-only approx_distinct_users entry:
    the HLL++ estimate per event_type must sit within the sketch's default
    relative error (rsd 0.05; assert a generous 3x band) of DuckDB's EXACT
    distinct count — the strongest portable check for an approximate
    aggregate whose exact value is engine-specific by design."""
    fn, _ = _registry()["approx_distinct_users"]
    got = {
        r["event_type"]: r["approx_users"]
        for r in fn(spark, SF_DIR).collect()
    }
    exact = {
        t: n
        for t, n in con.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events "
            "GROUP BY event_type"
        ).fetchall()
    }
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] - n) <= max(2, 0.15 * n), (t, got[t], n)


def test_approx_percentiles_within_sketch_error_of_exact(spark, con):
    """Bounded local oracle for the rows-only doc_length_approx_percentiles
    entry: each Greenwald-Khanna estimate must be an ACTUAL data value
    whose rank sits within the sketch's accuracy band (1/accuracy = 0.1%
    of rows per group; assert a generous +-2% rank band) of the requested
    quantile, per DuckDB's exact ranks."""
    fn, _ = _registry()["doc_length_approx_percentiles"]
    got = {
        r["lang"]: (r["p50"], r["p90"], r["n_docs"])
        for r in fn(spark, SF_DIR).collect()
    }
    for lang, (p50, p90, n) in got.items():
        lens = [
            v
            for (v,) in con.sql(
                "SELECT length(text) FROM documents WHERE lang = "
                f"'{lang}' ORDER BY 1"
            ).fetchall()
        ]
        assert n == len(lens)
        for est, q in ((p50, 0.5), (p90, 0.9)):
            assert est in lens, (lang, est)  # GK returns a real value
            lo = lens.index(est)
            hi = len(lens) - 1 - lens[::-1].index(est)
            band = max(2, int(0.02 * len(lens)))
            target = q * (len(lens) - 1)
            assert lo - band <= target <= hi + band, (lang, q, est)
