"""Cuckoo/bloom filter unit tests: zero false negatives (the exactness
invariant), bounded false positives, row-serialization round-trip,
determinism, and the parquet-native build/carry-forward paths."""

import numpy as np

from frontier_engine.membership import (
    BloomFilter,
    CuckooFilter,
    filter_from_row,
    filter_locations,
    load_bucket_filter,
)


def _hashes(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n).astype(np.int64).view(
        np.uint64
    )


def test_cuckoo_no_false_negatives():
    items = _hashes(50_000)
    f = CuckooFilter.with_capacity(len(items))
    assert f.insert_many(items)
    assert f.contains_many(items).all()
    # bounded false positives on disjoint probes
    probes = _hashes(50_000, seed=99)
    fp_rate = f.contains_many(probes).mean()
    assert fp_rate < 0.02, fp_rate
    # parquet-row round-trip preserves answers exactly
    r = f.to_row()
    g = filter_from_row(r["kind"], r["n_bits"], r["data"])
    assert (g.contains_many(probes) == f.contains_many(probes)).all()
    assert g.contains_many(items).all()


def test_cuckoo_incremental_insert():
    a, b = _hashes(10_000, 1), _hashes(10_000, 2)
    f = CuckooFilter.with_capacity(30_000)
    assert f.insert_many(a)
    assert f.insert_many(b)
    assert f.contains_many(a).all() and f.contains_many(b).all()


def test_cuckoo_overflow_reports_false():
    items = _hashes(10_000)
    f = CuckooFilter(16)  # tiny: 64 slots
    assert not f.insert_many(items)


def test_bloom_no_false_negatives():
    items = _hashes(100_000)
    f = BloomFilter.with_capacity(len(items))
    f.insert_many(items)
    assert f.contains_many(items).all()
    probes = _hashes(100_000, seed=5)
    assert f.contains_many(probes).mean() < 0.02
    r = f.to_row()
    g = filter_from_row(r["kind"], r["n_bits"], r["data"])
    assert g.contains_many(items).all()


def test_row_roundtrip_writable_copy_isolated():
    """writable=True must hand back a mutable copy — inserting into it must
    not corrupt the original serialized bytes."""
    items = _hashes(1_000)
    f = CuckooFilter.with_capacity(4_000)
    f.insert_many(items)
    r = f.to_row()
    g = filter_from_row(r["kind"], r["n_bits"], r["data"], writable=True)
    g.insert_many(_hashes(1_000, seed=3))
    h = filter_from_row(r["kind"], r["n_bits"], r["data"])
    assert (h.table == f.table).all()


def test_filters_deterministic():
    items = _hashes(5_000)
    t1 = CuckooFilter.with_capacity(len(items))
    t2 = CuckooFilter.with_capacity(len(items))
    t1.insert_many(items)
    t2.insert_many(items)
    assert (t1.table == t2.table).all()


def test_forced_overflow_rebuilds_bloom(spark, tmp_path):
    """End-to-end rebuild path under a skewed bucket: a cuckoo filter sized
    for a small cycle-1 delta must overflow on a huge cycle-2 delta and be
    rebuilt as a bloom over the bucket's FULL url_seen — with zero false
    negatives across both cycles (the exactness invariant), and with the
    streamed mapInPandas build (bounded per-task memory). Filters live as
    parquet rows written through TableIO — no .npz, no os.link."""
    from frontier_engine import membership, schemas
    from frontier_engine.config import EngineConfig
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    cfg = EngineConfig(n_buckets=4)

    def seen_df(hashes, bucket, cycle):
        return spark.createDataFrame(
            [(int(h), bucket, cycle) for h in hashes], schemas.URL_SEEN
        )

    io.commit(1, {"url_seen": (seen_df(range(1000, 1100), 1, 1), ["host_bucket"])})
    io.commit_meta_update(1, membership.rebuild_filters(spark, io, 1, cfg))
    f1 = load_bucket_filter(io.root, 1, 1)
    assert f1.kind == "cuckoo"  # small delta -> cuckoo

    io.commit(
        2, {"url_seen": (seen_df(range(50_000, 70_000), 1, 2), ["host_bucket"])}
    )
    io.commit_meta_update(2, membership.rebuild_filters(spark, io, 2, cfg))
    f2 = load_bucket_filter(io.root, 2, 1)
    assert f2.kind == "bloom"  # overflowed cuckoo -> full bloom rebuild

    h = np.array(
        list(range(1000, 1100)) + list(range(50_000, 70_000)), dtype=np.uint64
    )
    assert f2.contains_many(h).all()  # no false negatives, ever


def test_consolidation_rewrites_and_prunes(spark, tmp_path):
    """consolidate=True must re-emit untouched buckets into the current
    cycle's delta (parallel byte copy, no rebuild) and delete older filter
    dirs — the filters analog of url_seen_base compaction. Answers must be
    preserved exactly for both the touched and the carried bucket."""
    import os as _os

    from frontier_engine import membership, schemas
    from frontier_engine.config import EngineConfig
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    cfg = EngineConfig(n_buckets=4)

    def seen_df(rows, cycle):
        return spark.createDataFrame(
            [(int(h), b, cycle) for h, b in rows], schemas.URL_SEEN
        )

    io.commit(
        1,
        {
            "url_seen": (
                seen_df([(h, 1) for h in range(100)]
                        + [(h, 2) for h in range(500, 600)], 1),
                ["host_bucket"],
            )
        },
    )
    io.commit_meta_update(1, membership.rebuild_filters(spark, io, 1, cfg))

    # cycle 2 touches only bucket 1; consolidation must carry bucket 2
    io.commit(
        2, {"url_seen": (seen_df([(h, 1) for h in range(200, 250)], 2),
                         ["host_bucket"])}
    )
    m2 = membership.rebuild_filters(spark, io, 2, cfg, consolidate=True)
    io.commit_meta_update(2, m2)
    assert sorted(m2["filters_buckets"]) == [1, 2]  # carried bucket listed
    assert m2["filters"] == 2

    # old dir pruned; everything resolves to cycle 2
    assert not _os.path.isdir(_os.path.join(io.root, "filters", "cycle=1"))
    last_build, loc = filter_locations(io, 2)
    assert (last_build, loc) == (2, {1: 2, 2: 2})

    f1 = load_bucket_filter(io.root, 2, 1)
    both = np.array(list(range(100)) + list(range(200, 250)), dtype=np.uint64)
    assert f1.contains_many(both).all()
    f2 = load_bucket_filter(io.root, 2, 2)
    assert f2.contains_many(np.arange(500, 600, dtype=np.uint64)).all()


def test_empty_delta_cycle_does_not_crash_rebuild(spark, tmp_path):
    """A cycle whose url_seen delta is EMPTY (saturated frontier /
    all-duplicate discoveries) must not kill the build: the partitionBy
    write of an all-empty frame emits no parquet files, so a schema-less
    read-back would raise UNABLE_TO_INFER_SCHEMA (round-3 advice). The
    rebuild must no-op gracefully and keep the logical carry-forward."""
    from frontier_engine import membership, schemas
    from frontier_engine.config import EngineConfig
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    cfg = EngineConfig(n_buckets=4)

    def seen_df(rows, cycle):
        return spark.createDataFrame(
            [(int(h), b, cycle) for h, b in rows], schemas.URL_SEEN
        )

    io.commit(
        1, {"url_seen": (seen_df([(h, 1) for h in range(100)], 1),
                         ["host_bucket"])}
    )
    io.commit_meta_update(1, membership.rebuild_filters(spark, io, 1, cfg))

    # cycle 2: zero new url_seen rows
    io.commit(2, {"url_seen": (seen_df([], 2), ["host_bucket"])})
    m2 = membership.rebuild_filters(spark, io, 2, cfg)
    io.commit_meta_update(2, m2)
    assert m2["filters_buckets"] == []
    assert m2["filters"] == 1  # bucket 1 still covered, carried logically

    last_build, loc = filter_locations(io, 2)
    assert (last_build, loc) == (2, {1: 1})
    f = load_bucket_filter(io.root, loc[1], 1)
    assert f.contains_many(np.arange(100, dtype=np.uint64)).all()

    # consolidation on an empty delta: carries the bucket physically
    io.commit(3, {"url_seen": (seen_df([], 3), ["host_bucket"])})
    m3 = membership.rebuild_filters(spark, io, 3, cfg, consolidate=True)
    io.commit_meta_update(3, m3)
    assert m3["filters_buckets"] == [1]
    g = load_bucket_filter(io.root, 3, 1)
    assert g.contains_many(np.arange(100, dtype=np.uint64)).all()


def test_old_format_manifest_treated_as_no_build(spark, tmp_path):
    """A pre-parquet-store manifest (meta has "filters" but no
    "filters_buckets" — the round-2 .npz sidecar format, unreadable here)
    must be skipped by filter_locations: treating it as a valid build would
    set last_build while loc stays empty, so later rebuilds would only
    cover deltas after it and URLs first seen at-or-before it could test
    definitely-new (filter false negatives -> duplicate crawls)."""
    from frontier_engine import membership, schemas
    from frontier_engine.config import EngineConfig
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    cfg = EngineConfig(n_buckets=4)

    def seen_df(rows, cycle):
        return spark.createDataFrame(
            [(int(h), b, cycle) for h, b in rows], schemas.URL_SEEN
        )

    # cycle 1 committed by the OLD format: url_seen rows exist, manifest
    # claims a filter build but carries no filters_buckets key
    io.commit(1, {"url_seen": (seen_df([(h, 1) for h in range(100)], 1),
                               ["host_bucket"])})
    io.commit_meta_update(1, {"filters": 1})

    last_build, loc = filter_locations(io, 1)
    assert (last_build, loc) == (0, {})  # old build invisible -> no build

    # the next rebuild therefore covers deltas from cycle 1, not cycle 2
    io.commit(2, {"url_seen": (seen_df([(h, 1) for h in range(200, 250)], 2),
                               ["host_bucket"])})
    m2 = membership.rebuild_filters(spark, io, 2, cfg)
    io.commit_meta_update(2, m2)
    f = load_bucket_filter(io.root, 2, 1)
    both = np.array(list(range(100)) + list(range(200, 250)), dtype=np.uint64)
    assert f.contains_many(both).all()  # cycle-1 rows NOT missing


def test_logical_carry_forward_no_copy(spark, tmp_path):
    """A bucket untouched at cycle 2 must NOT be rewritten: cycle 2's delta
    holds only the changed bucket, and filter_locations resolves the
    untouched bucket back to its cycle-1 row (the logical carry-forward that
    replaced the round-2 hardlink)."""
    from frontier_engine import membership, schemas
    from frontier_engine.config import EngineConfig
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    cfg = EngineConfig(n_buckets=4)

    def seen_df(rows, cycle):
        return spark.createDataFrame(
            [(int(h), b, cycle) for h, b in rows], schemas.URL_SEEN
        )

    io.commit(
        1,
        {
            "url_seen": (
                seen_df([(h, 1) for h in range(100)]
                        + [(h, 2) for h in range(500, 600)], 1),
                ["host_bucket"],
            )
        },
    )
    m1 = membership.rebuild_filters(spark, io, 1, cfg)
    io.commit_meta_update(1, m1)
    assert sorted(m1["filters_buckets"]) == [1, 2]

    # cycle 2 touches only bucket 1
    io.commit(
        2, {"url_seen": (seen_df([(h, 1) for h in range(200, 250)], 2),
                         ["host_bucket"])}
    )
    m2 = membership.rebuild_filters(spark, io, 2, cfg)
    io.commit_meta_update(2, m2)
    assert m2["filters_buckets"] == [1]
    assert m2["filters"] == 2  # still covers both buckets

    last_build, loc = filter_locations(io, 2)
    assert last_build == 2
    assert loc == {1: 2, 2: 1}  # bucket 2 logically carried from cycle 1

    # bucket 2's row never re-written, still answers from cycle 1
    assert load_bucket_filter(io.root, 2, 2) is None
    f = load_bucket_filter(io.root, loc[2], 2)
    assert f.contains_many(np.arange(500, 600, dtype=np.uint64)).all()
    # bucket 1's cycle-2 row includes both deltas (incremental upsert)
    g = load_bucket_filter(io.root, loc[1], 1)
    both = np.array(list(range(100)) + list(range(200, 250)), dtype=np.uint64)
    assert g.contains_many(both).all()


def test_mixed_era_store_poisons_until_full_rebuild(spark, tmp_path):
    """Round-4 advice: a parquet delta build LAYERED on a legacy (.npz-era)
    build may cover only its delta range, so a mixed-era store must not be
    trusted at all — filter_locations returns (0, {}) (exact anti-join
    everywhere), the next rebuild inserts from cycle 1 and marks itself
    filters_full, and the store self-heals: after it, filter_locations
    trusts entries again and stops the walk at the full build."""
    from frontier_engine import membership, schemas
    from frontier_engine.config import EngineConfig
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    cfg = EngineConfig(n_buckets=4)

    def seen_df(rows, cycle):
        return spark.createDataFrame(
            [(int(h), b, cycle) for h, b in rows], schemas.URL_SEEN
        )

    # cycle 1: legacy build (no filters_buckets); cycle 2: a parquet build
    # layered on it (simulated: meta claims bucket 1 at cycle 2)
    io.commit(1, {"url_seen": (seen_df([(h, 1) for h in range(100)], 1),
                               ["host_bucket"])})
    io.commit_meta_update(1, {"filters": 1})
    io.commit(2, {"url_seen": (seen_df([(h, 1) for h in range(200, 250)], 2),
                               ["host_bucket"])})
    io.commit_meta_update(2, {"filters": 1, "filters_buckets": [1]})

    # poisoned: the layered entry above the legacy build is NOT trusted
    assert filter_locations(io, 2) == (0, {})

    # cycle 3 rebuild: prev_found == 0 -> inserts deltas 1..3, flags full
    io.commit(3, {"url_seen": (seen_df([(h, 1) for h in range(300, 320)], 3),
                               ["host_bucket"])})
    m3 = membership.rebuild_filters(spark, io, 3, cfg)
    assert m3.get("filters_full") is True
    io.commit_meta_update(3, m3)

    last_build, loc = filter_locations(io, 3)
    assert last_build == 3 and loc.get(1) == 3  # healed, trusted again
    f = load_bucket_filter(io.root, 3, 1)
    allh = np.array(
        list(range(100)) + list(range(200, 250)) + list(range(300, 320)),
        dtype=np.uint64,
    )
    assert f.contains_many(allh).all()  # full history covered
