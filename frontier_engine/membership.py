"""Cuckoo-filter URL-seen prefilter, bloom fallback for cold partitions.

North-star operator with no reference analog (the reference's "seen" set is
implied by sqlite ROWID monotonicity + the last_row checkpoint). Semantics:

- one filter per host_bucket partition, persisted as an .npz sidecar under
  ``<root>/filters/cycle=<k>/bucket=<b>.npz``;
- a filter answers "definitely not seen" / "maybe seen"; the engine routes
  maybe-seen candidates through the EXACT left-anti join against url_seen,
  so filter false positives cost time, never correctness, and the URL-seen
  membership stays exactly reproducible (BASELINE.json:2);
- filters are maintained INCREMENTALLY: each cycle's url_seen delta is
  inserted into the previous cycle's filter inside a grouped-map
  ``applyInPandas`` task (one task per bucket — the same exclusive-ownership
  sharding as the reference's per-container workers);
- a cold bucket (no sidecar yet, or a cuckoo filter that overflowed) is
  rebuilt from the bucket's FULL url_seen as a bloom filter — fully
  vectorized numpy, no per-item loop — per the north star's "bloom fallback
  for cold partitions";
- staleness is safe: if the newest sidecar lags the newest url_seen delta,
  the scheduler exact-joins "definite new" candidates against the missing
  delta range (scheduler.py split_by_filter call site).

All bit-twiddling is numpy-vectorized for lookups and bloom builds; only the
cuckoo insert path walks items (it touches only the small per-cycle delta).

STORAGE SEAM (mirrors TableIO's Iceberg seam): sidecars are .npz files
under ``io.root/filters/cycle=<k>/`` written by executor tasks and read by
later tasks — this requires ``io.root`` to be a SHARED filesystem (NFS/
Lustre/FUSE-mounted object store), the same assumption Spark makes for
``checkpointLocation``. On local[32] any path works. The carry-forward
hardlink degrades to a copy across devices (``rebuild_filters``); on a
store with no POSIX mount, swap ``_sidecar``/``load_filter``/``save`` for a
parquet-rows representation (bucket, kind, words BINARY) read through the
SparkSession — the call sites are already isolated behind these three
functions.
"""

from __future__ import annotations

import os
import uuid

import numpy as np

_FP_MASK = np.uint64(0xFFFF)
_MIX = np.uint64(0x9E3779B97F4A7C15)
_SLOTS = 4
_MAX_KICKS = 500
_CUCKOO_MAX_ITEMS = 4_000_000  # above this a fresh build uses bloom


def _mix64(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 64-bit finalizer, vectorized (public constants)."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class CuckooFilter:
    """16-bit fingerprints, 4-slot buckets, deterministic eviction."""

    kind = "cuckoo"

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        )

    @classmethod
    def with_capacity(cls, n: int) -> "CuckooFilter":
        nb = _next_pow2(max(16, int(n / (_SLOTS * 0.84)) + 1))
        return cls(nb)

    def _fp_i1_i2(self, h: np.ndarray):
        h = h.astype(np.uint64)
        fp = (h & _FP_MASK).astype(np.uint64)
        fp = np.where(fp == 0, np.uint64(1), fp)
        mask = np.uint64(self.n_buckets - 1)
        i1 = (h >> np.uint64(16)) & mask
        i2 = (i1 ^ ((fp * _MIX) >> np.uint64(32))) & mask
        return fp.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)

    def insert_many(self, hashes: np.ndarray) -> bool:
        """Insert all; False if any insertion failed (overflow).

        Bulk-vectorized: repeated passes place one fingerprint per empty
        (bucket, slot) via np.unique de-collision; only the residue that
        needs cuckoo eviction falls back to the per-item loop."""
        fps, i1s, i2s = self._fp_i1_i2(hashes)
        t = self.table
        pending = np.arange(len(hashes))
        for idxs in (i1s, i2s):
            for s in range(_SLOTS):
                if len(pending) == 0:
                    break
                cand = idxs[pending]
                empty = t[cand, s] == 0
                if not empty.any():
                    continue
                uniq_cand, first = np.unique(cand[empty], return_index=True)
                chosen = pending[empty][first]
                t[idxs[chosen], s] = fps[chosen]
                pending = pending[~np.isin(pending, chosen)]
        if len(pending) == 0:
            return True
        return self._insert_slow(fps[pending], i1s[pending], i2s[pending])

    def _insert_slow(self, fps, i1s, i2s) -> bool:
        t = self.table
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            placed = False
            for idx in (i1, i2):
                row = t[idx]
                for s in range(_SLOTS):
                    if row[s] == 0:
                        row[s] = fp
                        placed = True
                        break
                if placed:
                    break
            if placed:
                continue
            # deterministic eviction walk
            cur_fp, cur_idx = fp, i2
            ok = False
            for kick in range(_MAX_KICKS):
                s = kick % _SLOTS
                cur_fp, t[cur_idx][s] = int(t[cur_idx][s]), cur_fp
                mixed = (cur_fp * int(_MIX)) % (1 << 64)
                alt = (cur_idx ^ (mixed >> 32)) & (self.n_buckets - 1)
                row = t[alt]
                placed2 = False
                for s2 in range(_SLOTS):
                    if row[s2] == 0:
                        row[s2] = cur_fp
                        placed2 = True
                        break
                if placed2:
                    ok = True
                    break
                cur_idx = alt
            if not ok:
                return False
        return True

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test -> bool array ("maybe seen")."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s, i2s = self._fp_i1_i2(hashes)
        t = self.table
        hit1 = (t[i1s] == fps[:, None]).any(axis=1)
        hit2 = (t[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def save(self, path: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            np.savez(fh, kind=np.array(["cuckoo"]), table=self.table)
        os.rename(tmp, path)


class BloomFilter:
    """Blocked-free classic bloom: m bits, 4 double-hashed probes; build and
    lookup fully vectorized."""

    kind = "bloom"
    K = 4

    def __init__(self, n_bits: int, words: np.ndarray | None = None):
        self.n_bits = n_bits
        self.words = (
            words if words is not None else np.zeros(n_bits // 64, dtype=np.uint64)
        )

    @classmethod
    def with_capacity(cls, n: int) -> "BloomFilter":
        bits = max(1024, _next_pow2(n * 12))
        return cls(bits)

    def _probes(self, h: np.ndarray) -> np.ndarray:
        # independent h1/h2 via splitmix64-style finalizers — naive
        # g_j = h + j*(h*MIX) is linear in h, and (1 + j*MIX) can carry
        # low-order zero bits that collapse probe j onto a stride coset
        h = h.astype(np.uint64)
        h1 = _mix64(h)
        h2 = _mix64(h ^ _MIX) | np.uint64(1)
        mask = np.uint64(self.n_bits - 1)
        return np.stack(
            [(h1 + np.uint64(j) * h2) & mask for j in range(self.K)]
        )  # (K, n)

    def insert_many(self, hashes: np.ndarray) -> bool:
        if len(hashes) == 0:
            return True
        g = self._probes(hashes).reshape(-1)
        idx = (g >> np.uint64(6)).astype(np.int64)
        bit = (np.uint64(1) << (g & np.uint64(63))).astype(np.uint64)
        np.bitwise_or.at(self.words, idx, bit)
        return True

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        g = self._probes(hashes)
        idx = (g >> np.uint64(6)).astype(np.int64)
        bit = g & np.uint64(63)
        hits = ((self.words[idx] >> bit) & np.uint64(1)).astype(bool)
        return hits.all(axis=0)

    def save(self, path: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            np.savez(
                fh,
                kind=np.array(["bloom"]),
                words=self.words,
                n_bits=np.array([self.n_bits]),
            )
        os.rename(tmp, path)


def load_filter(path: str):
    with np.load(path, allow_pickle=False) as z:
        kind = str(z["kind"][0])
        if kind == "cuckoo":
            t = z["table"]
            return CuckooFilter(t.shape[0], table=t.copy())
        return BloomFilter(int(z["n_bits"][0]), words=z["words"].copy())


def _sidecar(dir_: str, bucket: int) -> str:
    return os.path.join(dir_, f"bucket={bucket}.npz")


# per-Python-worker sidecar cache for the mapInPandas prefilter; keyed by
# (cycle-specific dir, bucket) so entries are immutable — a worker holds at
# most the buckets its batches touched (cap guards pathological reuse)
_FILTER_CACHE: dict = {}


def _cached_filter(fdir: str, bucket: int):
    key = (fdir, bucket)
    if key not in _FILTER_CACHE:
        if len(_FILTER_CACHE) > 512:
            _FILTER_CACHE.clear()
        path = _sidecar(fdir, bucket)
        _FILTER_CACHE[key] = load_filter(path) if os.path.exists(path) else None
    return _FILTER_CACHE[key]


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def split_by_filter(cand: "DataFrame", io, through_cycle: int, cfg):
    """Split candidates into (definite_new, maybe_seen) using the newest
    sidecar filters ≤ through_cycle. Exactness-preserving: if filters lag the
    url_seen deltas, definite_new is patched with an exact anti-join over the
    missing delta range."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from . import schemas

    found = None
    for c in range(through_cycle, 0, -1):
        m = io.manifest(c)
        if m and m.get("meta", {}).get("filters") is not None:
            found = c
            break
    if found is None:
        # no filters yet: everything is maybe-seen (plain exact anti-join)
        return cand.limit(0), cand

    fdir = io.filter_dir(found)
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    # mapInPandas, NOT groupBy(host_bucket).applyInPandas: the candidates
    # were just hash-partitioned by url_hash (the within-batch dedup agg), so
    # a grouped-map would add a full extra shuffle AND require an entire
    # bucket's candidates in one pandas frame. Instead every task tests its
    # own Arrow batches, loading whichever buckets' sidecars it touches from
    # a per-worker cache (sidecars are small; <= n_buckets entries/worker,
    # cycle-keyed so never stale). Memory stays bounded by the Arrow batch.
    def check_batches(batches):
        import numpy as _np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = _np.ones(len(pdf), dtype=bool)  # no sidecar => maybe-seen
            h_all = pdf["url_hash"].to_numpy().astype(_np.int64).view(_np.uint64)
            for b, idx in pdf.groupby("host_bucket").indices.items():
                f = _cached_filter(fdir, int(b))
                if f is not None:
                    out[idx] = f.contains_many(h_all[idx])
            pdf = pdf.copy()
            pdf["maybe_seen"] = out
            yield pdf

    tested = cand.mapInPandas(check_batches, out_schema)
    definite_new = tested.where("NOT maybe_seen").drop("maybe_seen")
    maybe_seen = tested.where("maybe_seen").drop("maybe_seen")

    if found < through_cycle:
        # filters are stale: exact-confirm definite_new vs the missing range
        gap = io.read_delta_range(
            cand.sparkSession, "url_seen", found + 1, through_cycle,
            schemas.URL_SEEN,
        )
        definite_new = definite_new.join(gap, "url_hash", "left_anti")
    return definite_new, maybe_seen


def rebuild_filters(spark, io, cycle: int, cfg) -> int:
    """Maintain per-bucket sidecars for the url_seen set through `cycle`.

    Incremental: insert this cycle's delta into the previous sidecar.
    Cold/overflowed buckets rebuild from the bucket's full url_seen (bloom).
    Untouched buckets carry forward via hardlink. Returns #sidecars present.
    """
    from pyspark.sql import types as T

    from . import schemas

    out_dir = io.filter_dir(cycle)
    os.makedirs(out_dir, exist_ok=True)
    prev_dir = None
    prev_found = 0  # newest cycle whose sidecars we extend (0 = none)
    for c in range(cycle - 1, 0, -1):
        m = io.manifest(c)
        if m and m.get("meta", {}).get("filters") is not None:
            prev_dir = io.filter_dir(c)
            prev_found = c
            break

    # Insert EVERY committed delta the previous sidecars don't cover — not
    # just this cycle's. A run's final cycle skips the build
    # (build_filters=False), so after a resume the newest sidecar can lag by
    # several cycles; building from read_cycle(cycle) alone would leave the
    # intervening deltas permanently missing from all later sidecars and
    # misclassify seen URLs as definitely-new (duplicate url_seen rows).
    delta = io.read_delta_range(
        spark, "url_seen", prev_found + 1, cycle, schemas.URL_SEEN
    )
    res_schema = T.StructType(
        [
            T.StructField("host_bucket", T.IntegerType()),
            T.StructField("status", T.StringType()),
        ]
    )
    from pyspark.sql import functions as F

    # Both build stages run as mapInPandas ITERATORS over data repartitioned
    # by host_bucket: a task streams its buckets' rows batch by batch and
    # holds only the filters under construction — never a whole bucket's
    # url_seen in one pandas frame (at 10^10/64 URLs that frame alone is
    # GBs; the bloom being built is ~12 bits/item). Fresh-filter capacities
    # come from a tiny driver-side count per bucket. Sidecars stay
    # one-file-per-bucket; if a single bucket's bloom ever outgrows executor
    # memory the seam is (host_bucket, url_hash>>k) sub-shards of the same
    # .npz layout.
    cap = {
        int(r["host_bucket"]): int(r["n"])
        for r in delta.groupBy("host_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def upsert_batches(batches):
        import os as _os
        import pandas as _pd
        import numpy as _np

        state: dict = {}  # bucket -> [filter, ok]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h_all = pdf["url_hash"].to_numpy().astype(_np.int64).view(_np.uint64)
            for b, idx in pdf.groupby("host_bucket").indices.items():
                b = int(b)
                st = state.get(b)
                if st is None:
                    f = None
                    if prev_dir is not None:
                        p = _sidecar(prev_dir, b)
                        if _os.path.exists(p):
                            f = load_filter(p)
                    if f is None:
                        n = cap.get(b, len(idx))
                        if n <= _CUCKOO_MAX_ITEMS:
                            f = CuckooFilter.with_capacity(max(n * 4, 1024))
                        else:
                            f = BloomFilter.with_capacity(n)
                    st = state[b] = [f, True]
                if st[1]:
                    st[1] = st[0].insert_many(h_all[idx])
        rows = []
        for b, (f, ok) in state.items():
            if ok:
                f.save(_sidecar(out_dir, b))
            rows.append({"host_bucket": b, "status": "ok" if ok else "overflow"})
        yield _pd.DataFrame(rows, columns=["host_bucket", "status"])

    results = (
        delta.select("host_bucket", "url_hash")
        .repartition(cfg.n_buckets, "host_bucket")
        .mapInPandas(upsert_batches, res_schema)
        .collect()
    )
    overflow = [r["host_bucket"] for r in results if r["status"] == "overflow"]

    if overflow:
        full = io.read_appended(spark, "url_seen", cycle, schemas.URL_SEEN)
        full = full.where(full.host_bucket.isin(overflow))
        full_cap = {
            int(r["host_bucket"]): int(r["n"])
            for r in full.groupBy("host_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

        def rebuild_batches(batches):
            import pandas as _pd
            import numpy as _np

            blooms: dict = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                h_all = (
                    pdf["url_hash"].to_numpy().astype(_np.int64).view(_np.uint64)
                )
                for b, idx in pdf.groupby("host_bucket").indices.items():
                    b = int(b)
                    f = blooms.get(b)
                    if f is None:
                        f = blooms[b] = BloomFilter.with_capacity(full_cap[b])
                    f.insert_many(h_all[idx])
            rows = []
            for b, f in blooms.items():
                f.save(_sidecar(out_dir, b))
                rows.append({"host_bucket": b, "status": "bloom"})
            yield _pd.DataFrame(rows, columns=["host_bucket", "status"])

        (
            full.select("host_bucket", "url_hash")
            .repartition(cfg.n_buckets, "host_bucket")
            .mapInPandas(rebuild_batches, res_schema)
            .collect()
        )

    # carry forward untouched buckets
    if prev_dir is not None and os.path.isdir(prev_dir):
        have = {n for n in os.listdir(out_dir) if n.endswith(".npz")}
        for n in os.listdir(prev_dir):
            if n.endswith(".npz") and n not in have:
                try:
                    os.link(os.path.join(prev_dir, n), os.path.join(out_dir, n))
                except OSError:
                    import shutil

                    shutil.copy2(os.path.join(prev_dir, n), os.path.join(out_dir, n))

    return len([n for n in os.listdir(out_dir) if n.endswith(".npz")])
