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
