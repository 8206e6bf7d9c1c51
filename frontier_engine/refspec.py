"""Golden single-threaded crawl scheduler — the executable reference spec.

The real reference (thiagodasilva/container-crawler) is a change-scanning
framework, not a crawler; its correctness contract is behavioral — checkpoint
advances iff every row of the batch succeeded, ownership sharding is exact,
per-container stats equal the work performed (tests/unit/
test_container_crawler.py, the "Processed N rows; verified M rows"
assertions). This module is the web-scale restatement of that contract as an
executable oracle: a single-threaded pure-Python scheduler that defines the
EXACT crawl ordering, URL-seen membership, per-bucket lineage counts, and
retry/error semantics the Spark pipeline must reproduce (BASELINE.json:2
"crawl-order and URL-seen match vs reference under fixed seed list +
politeness budget").

Cycle-k semantics (normative; scheduler.py mirrors this stage for stage):

1. INGEST discoveries of cycle k-1 (cycle 1 ingests the seed list):
   canonicalize -> xxhash64 -> host/host_bucket; occurrences whose hash is
   already in url_seen are dropped (deduped++ at the candidate's bucket);
   remaining occurrences are grouped by hash keeping max(priority) (extra
   occurrences deduped++); admitted rows enter `pending` with
   crawl_ts = discovered_ts, retries = 0, and their hash enters url_seen.
   With cfg.recrawl_after_cycles = T (periodic change-scanning), a seen
   hash blocks only while its latest admission cycle > k - T OR the row is
   still pending; an expired, re-discovered hash is re-admitted as a fresh
   row (retries = 0) and its url_seen cycle advances to k.
2. rows_scanned(bucket) = |pending in bucket| after ingest.
   With cfg.host_rank_every = E, every parsed candidate with a parent adds
   the distinct edge (parent_host, host) to the link graph; with
   cfg.host_rank_priority, non-seed candidates get priority
   += min(2, rank(host) div PR_SCALE) capped at 100, where rank is the
   fixed-point integer PageRank built at the latest cycle j <= k-1 with
   j % E == 0 (graph_py.integer_pagerank_py over all edges through j).
3. ROBOTS: pending rows whose path starts with any disallow prefix of their
   host leave the frontier permanently (robots_skipped++; state='skipped').
   With cfg.robots_rfc, the decision is RFC 9309 instead: among matching
   (allow, disallow) rules the longest wins, allow wins length ties, no
   match means allowed; rule paths support §2.2.3 wildcards ("*" matches
   any sequence, a trailing "$" anchors the end of the path).
4. BUDGET: per host, order pending by (priority DESC, crawl_ts ASC,
   url_hash ASC) and schedule the first budget(host); enqueued++ per bucket.
   The scheduled batch of a bucket is ordered by the same total key.
5. FETCH each scheduled row: page present -> extract text (byte-identical by
   construction), state='done', fetched_ok++, outlinks become cycle-k
   discoveries with priority max(0, parent-decay) and
   discovered_ts = T0 + k hours. Page missing -> errors++; if
   retries < retry_limit the row stays pending with retries+1, else it
   leaves the frontier with state='error'.
6. Commit: url_seen delta, lineage rows, scheduled batch, pending carry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta

from .canon import canonicalize, host_of, path_of, path_query_of
from .config import EngineConfig
from .extract import discover_links, ref_extract
from .fixtures import T0
from .graph_py import PR_SCALE as _PR_SCALE
from .graph_py import integer_pagerank_py
from .robots_rfc import decide as rfc_decide
from .xxh import pmod_bucket, xxhash64_str

LINEAGE_FIELDS = (
    "rows_scanned",
    "enqueued",
    "deduped",
    "errors",
    "robots_skipped",
    "discovered",
    "fetched_ok",
)


@dataclass
class PendingRow:
    url_canon: str
    url_hash: int
    host: str
    host_bucket: int
    priority: int
    crawl_ts: object  # datetime
    discovered_ts: object
    retries: int = 0


@dataclass
class RefResult:
    # cycle -> bucket -> ordered list of scheduled tuples
    # (url_canon, url_hash, host, priority, crawl_ts_epoch_us, retries,
    #  planned_fetch_ts_epoch_us)
    scheduled: dict = field(default_factory=dict)
    # cycle -> {(cycle,bucket) lineage counts}
    lineage: dict = field(default_factory=dict)
    # final url_seen membership
    seen: set = field(default_factory=set)
    # url_hash -> cycle of its LATEST url_seen delta (recrawl TTL bookkeeping)
    seen_cycle: dict = field(default_factory=dict)
    # cycle -> set of url_hash admitted that cycle (url_seen deltas)
    seen_delta: dict = field(default_factory=dict)
    # final pending carry: url_hash -> PendingRow
    pending: dict = field(default_factory=dict)
    # url_hash -> final state for resolved rows ('done'|'error'|'skipped')
    resolved: dict = field(default_factory=dict)
    # host -> (scheduled_n, errors_n) of the LAST completed cycle
    # (error-backoff bookkeeping; carried so split runs resume exactly)
    host_stats_prev: dict = field(default_factory=dict)
    # accumulated distinct (src_host, dst_host) link-graph edges and the
    # host -> fixed-point rank of the LATEST completed rank build
    # (host_rank_every bookkeeping; carried so split runs resume exactly)
    host_edges: set = field(default_factory=set)
    host_rank: dict = field(default_factory=dict)


def _epoch_us(dt) -> int:
    return int(dt.timestamp() * 1_000_000)


def load_pages_lookup(pages_rows) -> dict:
    """canonical url -> (html, text); duplicate canonicals keep the row with
    the smallest (warc_ts, url) — mirrors the Spark pages_canon dedup."""
    lookup = {}
    for r in pages_rows:
        try:
            c = canonicalize(r["url"])
        except ValueError:  # non-fetchable page URL — engine drops it too
            continue
        key = (r["warc_ts"], r["url"])
        if c not in lookup or key < lookup[c][0]:
            lookup[c] = (key, r["html"], r["text"])
    return {c: (h, t) for c, (_, h, t) in lookup.items()}


def run(
    pages_rows: list[dict],
    seed_rows: list[dict],
    robots_rows: list[dict],
    cfg: EngineConfig,
    cycles: int,
    start_cycle: int = 1,
    state: RefResult | None = None,
    carry_discoveries: list | None = None,
) -> RefResult:
    """Run `cycles` crawl cycles; returns the full golden trace.

    ``state``/``carry_discoveries``/``start_cycle`` allow split runs for the
    resume-equivalence test (run 1..k, then k+1..n must equal 1..n).
    """
    pages = load_pages_lookup(pages_rows)
    robots = {
        r["host"]: (list(r["disallow"]), list(r.get("allow") or []))
        for r in robots_rows
    }
    delays = {
        r["host"]: int(r.get("crawl_delay_ms") or 0) for r in robots_rows
    }

    res = state if state is not None else RefResult()
    pending = res.pending
    seen = res.seen

    if carry_discoveries is not None:
        discoveries = list(carry_discoveries)
    else:
        discoveries = [
            (r["url"], int(r["priority"]), T0) for r in seed_rows
        ]

    for k in range(start_cycle, start_cycle + cycles):
        lin: dict[int, dict[str, int]] = {}

        def bump(bucket: int, field_: str, n: int = 1) -> None:
            d = lin.setdefault(bucket, {f: 0 for f in LINEAGE_FIELDS})
            d[field_] += n

        # -- 1. ingest -------------------------------------------------
        # recrawl TTL (periodic change-scanning): a seen entry blocks only
        # while its latest admission cycle > k - ttl; URLs still pending
        # are always blocked (they were admitted and not yet resolved)
        ttl = cfg.recrawl_after_cycles
        hre = cfg.host_rank_every
        grouped: dict[int, PendingRow] = {}
        for tup in discoveries:
            raw, prio, dts, src = (tuple(tup) + (None,))[:4]
            try:
                c = canonicalize(raw)
            except ValueError:  # unparseable href — dropped, like the engine
                continue
            h = xxhash64_str(c)
            host = host_of(c)
            bucket = pmod_bucket(host, cfg.n_buckets)
            if hre and src is not None and src != host:
                res.host_edges.add((src, host))
            if cfg.host_rank_priority and src is not None:
                # authority boost from the latest committed rank build
                # (<= previous cycle): +min(2, rnk div PR_SCALE), cap 100
                prio = min(
                    100,
                    prio
                    + min(2, res.host_rank.get(host, 0) // _PR_SCALE),
                )
            if h in seen and (
                ttl is None or res.seen_cycle[h] > k - ttl or h in pending
            ):
                bump(bucket, "deduped")
                continue
            if h in grouped:
                bump(bucket, "deduped")
                if prio > grouped[h].priority:
                    grouped[h].priority = prio
                continue
            grouped[h] = PendingRow(
                url_canon=c,
                url_hash=h,
                host=host,
                host_bucket=bucket,
                priority=prio,
                crawl_ts=dts,
                discovered_ts=dts,
            )
        res.seen_delta[k] = set(grouped.keys())
        for h, row in grouped.items():
            seen.add(h)
            res.seen_cycle[h] = k
            pending[h] = row
            bump(row.host_bucket, "discovered")

        # -- 2. rows_scanned --------------------------------------------
        for row in pending.values():
            bump(row.host_bucket, "rows_scanned")

        # -- 3. robots ---------------------------------------------------
        for h in list(pending.keys()):
            row = pending[h]
            dis, alw = robots.get(row.host, ([], []))
            p = path_of(row.url_canon)
            if cfg.robots_rfc:
                # RFC 9309: longest matching rule wins, allow wins ties;
                # §2.2.3 wildcards ("*" any-sequence, trailing "$" end
                # anchor) via the shared pyspark-free robots_rfc module.
                # The match TARGET is path+query (§2.2.2 strips only
                # scheme/authority/fragment — rules like /*sessionid are
                # designed to hit query params); prefix mode below keeps
                # the reference's path-only SkipContainer shape.
                is_blocked = rfc_decide(path_query_of(row.url_canon), dis, alw)
            else:
                # empty rule (bare "Disallow:" = allow-all) is a no-match,
                # matching the engine's length guard and rfc mode's
                # 0-length-never-wins semantics
                is_blocked = any(d and p.startswith(d) for d in dis)
            if is_blocked:
                bump(row.host_bucket, "robots_skipped")
                res.resolved[h] = "skipped"
                del pending[h]

        # -- 4. budget ----------------------------------------------------
        by_host: dict[str, list[PendingRow]] = {}
        for row in pending.values():
            by_host.setdefault(row.host, []).append(row)
        scheduled: list[PendingRow] = []
        # planned_fetch_ts: crawl-delay pacing — the i-th scheduled URL of a
        # host (0-based, in crawl order) is planned at
        # cycle_base + i * crawl_delay_ms(host)
        cycle_base_us = _epoch_us(T0 + timedelta(hours=k - 1))
        planned_us: dict[int, int] = {}
        bpct = cfg.error_backoff_pct

        def eff_budget(host: str) -> int:
            b = cfg.budget_of(host)
            if bpct is not None and host in res.host_stats_prev:
                s, e = res.host_stats_prev[host]
                if s > 0 and e * 100 >= bpct * s:
                    b = max(1, b // 2)
            return b

        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r.priority, r.crawl_ts, r.url_hash))
            take = rows[: eff_budget(host)]
            d_us = delays.get(host, 0) * 1000
            for i, r in enumerate(take):
                planned_us[r.url_hash] = cycle_base_us + i * d_us
            scheduled.extend(take)
        for row in scheduled:
            bump(row.host_bucket, "enqueued")

        by_bucket: dict[int, list[PendingRow]] = {}
        for row in scheduled:
            by_bucket.setdefault(row.host_bucket, []).append(row)
        res.scheduled[k] = {
            b: [
                (
                    r.url_canon,
                    r.url_hash,
                    r.host,
                    r.priority,
                    _epoch_us(r.crawl_ts),
                    r.retries,
                    planned_us[r.url_hash],
                )
                for r in sorted(
                    rows, key=lambda r: (-r.priority, r.crawl_ts, r.url_hash)
                )
            ]
            for b, rows in by_bucket.items()
        }

        # -- 5. fetch -------------------------------------------------------
        next_dts = T0 + timedelta(hours=k)
        next_discoveries = []
        host_stats: dict[str, list[int]] = {}
        for row in scheduled:
            hs = host_stats.setdefault(row.host, [0, 0])
            hs[0] += 1
            page = pages.get(row.url_canon)
            if page is None:
                hs[1] += 1
                bump(row.host_bucket, "errors")
                if row.retries < cfg.retry_limit:
                    row.retries += 1  # stays pending; retried next cycle
                else:
                    res.resolved[row.url_hash] = "error"
                    del pending[row.url_hash]
                continue
            html, text = page
            extracted = ref_extract(html)
            assert extracted == text, "fixture extraction invariant broken"
            bump(row.host_bucket, "fetched_ok")
            res.resolved[row.url_hash] = "done"
            del pending[row.url_hash]
            child_prio = max(0, row.priority - cfg.link_priority_decay)
            for href in discover_links(html):
                next_discoveries.append(
                    (href, child_prio, next_dts, row.host)
                )

        res.lineage[k] = lin
        res.host_stats_prev = {h: tuple(v) for h, v in host_stats.items()}
        if hre and k % hre == 0:
            # rank build over all edges harvested through THIS cycle —
            # consumed by ingest from the NEXT cycle on (mirrors the
            # engine's committed host_rank table read from manifests);
            # graph_py keeps this pyspark-import-free
            res.host_rank = integer_pagerank_py(res.host_edges)
        discoveries = next_discoveries

    res.carry_discoveries = discoveries  # type: ignore[attr-defined]
    return res


def read_fixture_rows(fixture_dir: str):
    """Read pages/seeds/robots parquet as plain python rows (pyarrow only)."""
    import os

    import pyarrow.parquet as pq

    def rows(name):
        return pq.read_table(os.path.join(fixture_dir, name)).to_pylist()

    return rows("pages.parquet"), rows("seeds.parquet"), rows("robots.parquet")
