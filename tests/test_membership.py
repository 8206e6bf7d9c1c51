"""Cuckoo/bloom filter unit tests: zero false negatives (the exactness
invariant), bounded false positives, save/load round-trip, determinism."""

import numpy as np

from frontier_engine.membership import BloomFilter, CuckooFilter, load_filter


def _hashes(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n).astype(np.int64).view(
        np.uint64
    )


def test_cuckoo_no_false_negatives(tmp_path):
    items = _hashes(50_000)
    f = CuckooFilter.with_capacity(len(items))
    assert f.insert_many(items)
    assert f.contains_many(items).all()
    # bounded false positives on disjoint probes
    probes = _hashes(50_000, seed=99)
    fp_rate = f.contains_many(probes).mean()
    assert fp_rate < 0.02, fp_rate
    # save/load round-trip preserves answers exactly
    p = str(tmp_path / "c.npz")
    f.save(p)
    g = load_filter(p)
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


def test_bloom_no_false_negatives(tmp_path):
    items = _hashes(100_000)
    f = BloomFilter.with_capacity(len(items))
    f.insert_many(items)
    assert f.contains_many(items).all()
    probes = _hashes(100_000, seed=5)
    assert f.contains_many(probes).mean() < 0.02
    p = str(tmp_path / "b.npz")
    f.save(p)
    g = load_filter(p)
    assert g.contains_many(items).all()


def test_filters_deterministic():
    items = _hashes(5_000)
    t1 = CuckooFilter.with_capacity(len(items))
    t2 = CuckooFilter.with_capacity(len(items))
    t1.insert_many(items)
    t2.insert_many(items)
    assert (t1.table == t2.table).all()


def test_forced_overflow_rebuilds_bloom(spark, tmp_path):
    """End-to-end rebuild path under a skewed bucket: a cuckoo sidecar sized
    for a small cycle-1 delta must overflow on a huge cycle-2 delta and be
    rebuilt as a bloom over the bucket's FULL url_seen — with zero false
    negatives across both cycles (the exactness invariant), and with the
    streamed mapInPandas build (bounded per-task memory)."""
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
    n = membership.rebuild_filters(spark, io, 1, cfg)
    io.commit_meta_update(1, {"filters": n})
    f1 = membership.load_filter(membership._sidecar(io.filter_dir(1), 1))
    assert f1.kind == "cuckoo"  # small delta -> cuckoo

    io.commit(
        2, {"url_seen": (seen_df(range(50_000, 70_000), 1, 2), ["host_bucket"])}
    )
    n2 = membership.rebuild_filters(spark, io, 2, cfg)
    io.commit_meta_update(2, {"filters": n2})
    f2 = membership.load_filter(membership._sidecar(io.filter_dir(2), 1))
    assert f2.kind == "bloom"  # overflowed cuckoo -> full bloom rebuild

    h = np.array(
        list(range(1000, 1100)) + list(range(50_000, 70_000)), dtype=np.uint64
    )
    assert f2.contains_many(h).all()  # no false negatives, ever
