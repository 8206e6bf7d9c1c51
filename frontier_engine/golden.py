"""Golden-comparison harness: run the Spark engine on a fixture dir and
compare its trace (scheduled order, url_seen, lineage) against refspec.py.

This is the engine's version of the reference's verified-sharding tests
(tests/unit/test_container_crawler.py: owned rows + verification pass must
BOTH match before the checkpoint advances): an independent computation of
the same batch confirms the distributed result exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import schemas
from .config import EngineConfig
from .scheduler import FrontierScheduler, prepare_pages
from .tableio import TableIO


def build_engine(
    spark: SparkSession, fixture_dir: str, workdir: str, cfg: EngineConfig
) -> FrontierScheduler:
    import shutil

    io = TableIO(workdir)
    pages_canon = os.path.join(workdir, "pages_canon")
    marker = os.path.join(workdir, "pages_canon.nbuckets")
    rebuild = not os.path.exists(pages_canon)
    if not rebuild:
        # the bucketed table's physical layout bakes in n_buckets and the
        # source fixture; reusing it under a different cfg would register
        # wrong CLUSTERED BY metadata and silently misroute the bucketed
        # fetch join, and reusing it for a DIFFERENT fixture_dir (same
        # n_buckets) would golden-compare against the wrong corpus
        if not os.path.exists(marker):
            # dir without marker = a build interrupted between the table
            # rename and the marker write — rebuild instead of erroring
            shutil.rmtree(pages_canon)
            rebuild = True
        else:
            with open(marker) as f:
                lines = f.read().splitlines()
            prev = int(lines[0])
            prev_fix = lines[1] if len(lines) > 1 else None
            if prev != cfg.n_buckets or (
                prev_fix is not None
                and prev_fix != os.path.abspath(fixture_dir)
            ):
                raise ValueError(
                    f"workdir {workdir!r} has pages_canon prepared with "
                    f"n_buckets={prev} from {prev_fix!r}, but this build "
                    f"wants n_buckets={cfg.n_buckets} from "
                    f"{os.path.abspath(fixture_dir)!r}; use a fresh "
                    "workdir (or matching cfg/fixture)"
                )
    if rebuild:
        pages_canon = prepare_pages(
            spark, os.path.join(fixture_dir, "pages.parquet"), io, cfg
        )
        with open(marker, "w") as f:
            f.write(f"{cfg.n_buckets}\n{os.path.abspath(fixture_dir)}")
    robots = spark.read.parquet(os.path.join(fixture_dir, "robots.parquet"))
    seeds = spark.read.parquet(os.path.join(fixture_dir, "seeds.parquet"))
    return FrontierScheduler(spark, io, cfg, pages_canon, robots, seeds)


def spark_trace(spark: SparkSession, io: TableIO, cycles: range) -> dict:
    """Collect the comparable trace of committed cycles."""
    out: dict = {"scheduled": {}, "lineage": {}, "seen": set(), "pending": {}}
    last = 0
    for k in cycles:
        sched = (
            io.read_cycle(spark, "scheduled", k, schemas.SCHEDULED)
            .select(
                "host_bucket", "fetch_seq", "url_canon", "url_hash", "host",
                "priority", F.unix_micros("crawl_ts").alias("ts_us"), "retries",
                F.unix_micros("planned_fetch_ts").alias("planned_us"),
            )
            .collect()
        )
        by_bucket: dict = {}
        for r in sched:
            by_bucket.setdefault(r["host_bucket"], []).append(r)
        out["scheduled"][k] = {
            b: [
                (r["url_canon"], r["url_hash"], r["host"], r["priority"],
                 r["ts_us"], r["retries"], r["planned_us"])
                for r in sorted(rows, key=lambda r: r["fetch_seq"])
            ]
            for b, rows in by_bucket.items()
        }
        lin = io.read_cycle(spark, "lineage", k, schemas.LINEAGE).collect()
        out["lineage"][k] = {
            r["host_bucket"]: {
                "rows_scanned": r["rows_scanned"],
                "enqueued": r["enqueued"],
                "deduped": r["deduped"],
                "errors": r["errors"],
                "robots_skipped": r["robots_skipped"],
                "discovered": r["discovered"],
                "fetched_ok": r["fetched_ok"],
            }
            for r in lin
        }
        last = k
    seen = io.read_appended(spark, "url_seen", last, schemas.URL_SEEN)
    out["seen"] = {r["url_hash"] for r in seen.select("url_hash").collect()}
    pend = io.read_cycle(spark, "pending", last, schemas.PENDING)
    out["pending"] = {
        r["url_hash"]: (r["url_canon"], r["priority"], r["retries"])
        for r in pend.collect()
    }
    return out


def ref_trace(res) -> dict:
    """Shape a refspec.RefResult like spark_trace's output."""
    return {
        "scheduled": res.scheduled,
        "lineage": {
            k: {
                b: {f: v[f] for f in (
                    "rows_scanned", "enqueued", "deduped", "errors",
                    "robots_skipped", "discovered", "fetched_ok",
                )}
                for b, v in lin.items()
            }
            for k, lin in res.lineage.items()
        },
        "seen": set(res.seen),
        "pending": {
            h: (r.url_canon, r.priority, r.retries)
            for h, r in res.pending.items()
        },
    }


def diff_traces(a: dict, b: dict) -> list[str]:
    """Human-readable mismatches (empty list == exact match)."""
    probs = []
    if a["seen"] != b["seen"]:
        probs.append(
            f"url_seen differs: only-a={len(a['seen'] - b['seen'])} "
            f"only-b={len(b['seen'] - a['seen'])}"
        )
    if a["pending"] != b["pending"]:
        ka, kb = set(a["pending"]), set(b["pending"])
        probs.append(
            f"pending differs: only-a={len(ka - kb)} only-b={len(kb - ka)} "
            f"value-diffs={sum(1 for k in ka & kb if a['pending'][k] != b['pending'][k])}"
        )
    for k in sorted(set(a["scheduled"]) | set(b["scheduled"])):
        sa, sb = a["scheduled"].get(k, {}), b["scheduled"].get(k, {})
        if set(sa) != set(sb):
            probs.append(f"cycle {k}: bucket sets differ {set(sa) ^ set(sb)}")
            continue
        for bkt in sa:
            if sa[bkt] != sb[bkt]:
                probs.append(
                    f"cycle {k} bucket {bkt}: scheduled order differs "
                    f"(a={sa[bkt][:3]}..., b={sb[bkt][:3]}...)"
                )
    for k in sorted(set(a["lineage"]) | set(b["lineage"])):
        la, lb = a["lineage"].get(k, {}), b["lineage"].get(k, {})
        if la != lb:
            keys = set(la) | set(lb)
            bad = [
                (bkt, la.get(bkt), lb.get(bkt))
                for bkt in keys
                if la.get(bkt) != lb.get(bkt)
            ]
            probs.append(f"cycle {k}: lineage differs at buckets {bad[:3]}")
    return probs
