"""The Spark crawl-cycle loop — the generalized change-scanning engine.

One ``run_cycle`` = one ``Crawler.run_once`` of the reference
(container_crawler/__init__.py ≈L405-430: enumerate → diff vs last_row →
shard → dispatch → checkpoint). Stage-for-stage mirror of refspec.py's
normative semantics, expressed as a single declarative DataFrame graph per
cycle so Catalyst gets the whole plan (pushdown, pruning, broadcast
selection, AQE skew splitting).

Scale notes (10^10-URL frontier, 1000 executors):
- the `html BINARY` column is touched ONLY in the fetch join + extraction
  stage and dropped immediately after; no wide operator ever shuffles page
  bodies.
- url_seen dedup is a left-anti join on the 64-bit key, prefiltered by
  per-bucket cuckoo filters (membership.py) so the exact join sees only
  candidates that *might* be duplicates; membership stays exactly
  reproducible because the filter can only short-circuit definite-negatives.
- the priority queue is a repartition on host_bucket (+ optional salt for
  hot hosts) with sortWithinPartitions — shuffle once, sort locally;
  per-host order is enforced logically by the budget window's total key
  (priority DESC, crawl_ts, url_hash), so salting never changes results.
- pending carry + url_seen deltas are written partitioned by host_bucket:
  next cycle's joins read co-partitioned data and partition-prune.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import schemas
from .canon import canon_host_udf
from .config import EngineConfig
from .extract import handle_page_udf
from .fixtures import T0
from .politeness import apply_robots, budgets_df, rank_by_budget
from .tableio import TableIO

def _bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


# Write salt for the cell-partitioned ANN index: k-means / LSH cells over
# web text are Zipf-skewed, and a plain repartition(n_cells, "cell") makes
# the hottest cell ONE straggler task writing ONE giant file at 100-TB
# scale. Salting the repartition key (cell, pmod(url_hash, SALT)) spreads a
# hot cell over up to SALT tasks/files while partitionBy("cell") keeps the
# directory layout — probe-side partition pruning is unchanged.
ANN_WRITE_SALT = 4


def prepare_pages(
    spark: SparkSession, pages_path: str, io: TableIO, cfg: EngineConfig
) -> str:
    """One-time corpus prep: canonicalize, key, dedup duplicate canonical
    spellings (keep min (warc_ts, url)), write BUCKETED by url_hash.

    At 100 TB this is the single full shuffle of the dataset. Because the
    output is a Spark-bucketed table on the fetch-join key, every later
    cycle's fetch join shuffles ONLY the slim scheduled side — the page
    bodies (html) never cross a shuffle again."""
    import uuid as _uuid

    pages = spark.read.parquet(pages_path)
    ch = canon_host_udf()
    pc = (
        pages.withColumn("_ch", ch("url"))
        .select(
            F.col("_ch.url_canon").alias("url_canon"),
            F.col("_ch.host").alias("host"),
            "url",
            "warc_ts",
            "html",
            "text",
            "lang",
        )
        # a non-fetchable page URL canonicalizes to NULL (canon fetchability
        # gate) — drop it here like ingest does, so no NULL-keyed row
        # survives into the bucketed corpus (refspec's load_pages_lookup
        # mirrors the skip)
        .where(F.col("url_canon").isNotNull())
        .withColumn("url_hash", F.xxhash64("url_canon"))
        .withColumn("host_bucket", _bucket(F.col("host"), cfg.n_buckets))
    )
    w = Window.partitionBy("url_canon").orderBy("warc_ts", "url")
    pc = (
        pc.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "url")
        .select(*schemas.PAGES_CANON.fieldNames())
    )
    loc = os.path.join(io.root, "pages_canon")
    # write to a tmp location and rename into place so a crash mid-prepare
    # never leaves a partial pages_canon that a later exists-check (bench
    # ensure_corpus, golden build_engine) would trust as complete
    tmp_loc = loc + ".tmp-" + _uuid.uuid4().hex[:8]
    writer_name = f"pages_canon_writer_{_uuid.uuid4().hex[:8]}"
    (
        pc.write.mode("overwrite")
        .bucketBy(cfg.n_buckets, "url_hash")
        .sortBy("url_hash")
        .option("path", tmp_loc)
        .saveAsTable(writer_name)
    )
    # keep the files (external location), drop the session-local entry —
    # readers re-register via register_pages_table
    spark.sql(f"DROP TABLE {writer_name}")
    if os.path.exists(loc):
        import shutil as _shutil

        _shutil.rmtree(loc)
    os.rename(tmp_loc, loc)
    return loc


def register_pages_table(spark: SparkSession, loc: str, n_buckets: int) -> str:
    """Register the bucketed pages_canon files as an external table in this
    session's catalog (the in-memory catalog is session-scoped)."""
    import hashlib

    # a relative LOCATION would silently resolve under spark-warehouse/
    loc = os.path.abspath(loc)
    name = "pages_canon_" + hashlib.md5(loc.encode()).hexdigest()[:10]
    if not spark.catalog.tableExists(name):
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in schemas.PAGES_CANON.fields
        )
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY (url_hash) SORTED BY (url_hash) "
            f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
        )
    return name


def _lineage_wide(
    cand: DataFrame,
    ingested: DataFrame,
    with_robots: DataFrame,
    ranked: DataFrame,
    fetched: DataFrame,
    cycle: int,
) -> DataFrame:
    """Per-bucket lineage in ONE aggregation per source frame (5 scans), each
    producing several metrics via conditional sums — replaces the earlier
    7-scan long-format union + pivot. The frames are the persisted pipeline
    stages, so computing lineage doubles as the cache-warming materialization
    pass for the commit writes."""
    one = F.count(F.lit(1))
    m_cand = cand.groupBy("host_bucket").agg(one.alias("cand_total"))
    m_disc = ingested.groupBy("host_bucket").agg(one.alias("discovered"))
    m_scan = with_robots.groupBy("host_bucket").agg(
        one.alias("rows_scanned"),
        F.sum(F.col("blocked").cast("long")).alias("robots_skipped"),
    )
    m_enq = ranked.groupBy("host_bucket").agg(
        F.sum((F.col("rk") <= F.col("budget")).cast("long")).alias("enqueued")
    )
    m_fetch = fetched.groupBy("host_bucket").agg(
        F.sum((~F.col("ok")).cast("long")).alias("errors"),
        F.sum(F.col("ok").cast("long")).alias("fetched_ok"),
    )
    wide = m_scan
    for m in (m_cand, m_disc, m_enq, m_fetch):
        wide = wide.join(m, "host_bucket", "full_outer")
    return (
        wide.na.fill(0, [c for c in wide.columns if c != "host_bucket"])
        .withColumn("cycle", F.lit(cycle))
        .withColumn("deduped", F.col("cand_total") - F.col("discovered"))
        .select(*schemas.LINEAGE.fieldNames())
    )


@dataclass
class CycleResult:
    cycle: int
    scheduled_rows: int
    manifest: dict
    lineage: list | None = None


class FrontierScheduler:
    """Drives cycles against a TableIO root. Stateless between calls —
    everything needed to continue lives in committed snapshots (resume =
    ``latest_cycle() + 1``), mirroring the reference's crash-safe
    write-on-success checkpoint discipline."""

    def __init__(
        self,
        spark: SparkSession,
        io: TableIO,
        cfg: EngineConfig,
        pages_canon_path: str,
        robots: DataFrame,
        seeds: DataFrame,
    ):
        self.spark = spark
        self.io = io
        self.cfg = cfg
        self.pages_canon_path = pages_canon_path
        self.robots = robots
        self.seeds = seeds
        self.budgets = budgets_df(spark, cfg.budgets)
        # the robots dim is host-cardinality: broadcast-hint it only under
        # the host ceiling (one count job, paid once per scheduler — at
        # ~10^8 north-star hosts the rule-array dim is far past broadcast
        # size and AQE must choose the join strategy instead)
        from .graph import is_small_dim

        self._robots_small = is_small_dim(robots)

    # -- inputs per cycle ---------------------------------------------------

    def _pages_canon(self) -> DataFrame:
        name = register_pages_table(
            self.spark, self.pages_canon_path, self.cfg.n_buckets
        )
        return self.spark.table(name)

    def _discoveries(self, cycle: int) -> DataFrame:
        if cycle == 1:
            return self.seeds.select(
                "url",
                F.col("priority").cast("int").alias("priority"),
                F.lit(T0).cast("timestamp").alias("discovered_ts"),
                F.lit(None).cast("string").alias("src_host"),
            )
        return self.io.read_cycle(
            self.spark, "discoveries", cycle - 1, schemas.DISCOVERIES
        )

    def _latest_host_rank(self, cycle: int) -> tuple[int, DataFrame] | None:
        """Newest committed host_rank table at a cycle <= cycle-1 (manifest
        walk only — no data reads until the caller joins it). Returns
        (build_cycle, df) so consumers can cache per-build work — the
        broadcast-gate count in particular runs once per rank BUILD, not
        once per scheduling cycle."""
        for c in range(cycle - 1, 0, -1):
            m = self.io.manifest(c)
            if m and "host_rank" in m.get("tables", {}):
                return c, self.io.read_cycle(
                    self.spark, "host_rank", c, schemas.HOST_RANK
                )
        return None

    def _auto_salt(self, cycle: int) -> int:
        """Physical salt from OBSERVED skew (cfg.auto_salt): the previous
        cycle records the hottest single host's share of the eligible
        frontier in its manifest meta (two scalars from one partial-agg
        job over the already-persisted ranked frame — no extra frontier
        scan). Share is scale-free: one host owning >= 10% of a frontier
        is exactly the skew the two-phase window and salted queue write
        fight, at 2k URLs or 10^10. salt = next_pow2(share * 32) capped
        at 16 (the window's survivor bound is salt * budget per host).
        Deterministic given committed history -> resumes pick the same
        salt."""
        if cycle <= 1:
            return 1
        m = self.io.manifest(cycle - 1) or {}
        meta = m.get("meta", {})
        hottest = meta.get("host_depth_max", 0)
        total = meta.get("host_depth_total", 0)
        if not total or not hottest:
            return 1
        share = hottest / total
        # both gates must fire: share (is one host dominating?) AND an
        # absolute depth floor (a window over <= 8 x budget rows is cheap
        # regardless of share — tiny frontiers make share pure noise)
        if share < 0.10 or hottest < 8 * self.cfg.default_budget:
            return 1
        p = 1
        while p < share * 32:
            p <<= 1
        return min(16, p)

    # -- the cycle ---------------------------------------------------------

    def run_cycle(self, cycle: int, build_filters: bool = True) -> CycleResult:
        """One crawl cycle. Every frame persisted inside the body is
        registered on ``tracked`` and unpersisted here in a finally: an
        exception mid-cycle must not leak cached frames into the Spark
        session for its remaining lifetime (a long-running driver loop
        retries cycles — leaked caches would accumulate across retries)."""
        tracked: list = []
        try:
            return self._run_cycle(cycle, build_filters, tracked)
        finally:
            for df in tracked:
                df.unpersist()

    def _run_cycle(
        self, cycle: int, build_filters: bool, tracked: list
    ) -> CycleResult:
        spark, io, cfg = self.spark, self.io, self.cfg

        def _p(df):
            """persist + register for the end-of-cycle finally unpersist"""
            tracked.append(df)
            return df.persist()
        if cfg.auto_salt:
            politeness_salt = salt_factor = self._auto_salt(cycle)
        else:
            politeness_salt, salt_factor = cfg.politeness_salt, cfg.salt_factor
        import time as _time

        _timing = os.environ.get("FRONTIER_TIMING") == "1"
        _t = [_time.time()]

        def tick(label, df=None):
            if not _timing:
                return
            if df is not None:
                df.count()  # force, for attribution only
            now = _time.time()
            print(f"  [cycle {cycle}] {label}: {now - _t[0]:.1f}s", flush=True)
            _t[0] = now

        fresh_start = io.manifest(cycle - 1) is None  # nothing committed yet
        # does this cycle consolidate the accumulating tables? needed early:
        # the ANN stage folds its quantizer retrain into the compaction
        compact = cfg.compact_every > 0 and cycle % cfg.compact_every == 0
        pending_prev = io.read_cycle(
            spark, "pending", cycle - 1, schemas.PENDING
        )
        # recrawl TTL (periodic change-scanning, refspec §1): a url_seen
        # row blocks re-enqueue only while first_seen_cycle > cycle - ttl.
        # A recrawled URL writes a fresh delta row at its new cycle, so the
        # latest admission always sits inside the window; expired rows stay
        # in the table (compaction/filters need full history) but stop
        # blocking here. URLs still waiting in the frontier are blocked by
        # the pending anti-join below instead (url_seen marks ENQUEUE).
        # Scan path: only the last ttl cycles' deltas are read (the full
        # seen history never has to be scanned per cycle); the residual
        # where() handles a consolidated base that folds older rows in.
        ttl = cfg.recrawl_after_cycles
        if ttl is not None:
            lo = max(1, cycle - ttl + 1)
            seen = io.read_appended_since(
                spark, "url_seen", cycle - 1, lo, schemas.URL_SEEN
            ).where(F.col("first_seen_cycle") >= lo)
        else:
            seen = io.read_appended(
                spark, "url_seen", cycle - 1, schemas.URL_SEEN
            )

        # ---- 1. ingest: canonicalize -> key -> dedup (batch + seen) -------
        # spread candidates across all cores BEFORE the pandas UDF — a
        # single-file seed list would otherwise pin canonicalization to a
        # couple of input splits (skip the shuffle when the input is
        # already split finely enough)
        par = spark.sparkContext.defaultParallelism
        discoveries = self._discoveries(cycle)
        if discoveries.rdd.getNumPartitions() < par:
            discoveries = discoveries.repartition(par)
        ch = canon_host_udf()
        cand = (
            discoveries
            .withColumn("_ch", ch("url"))
            .select(
                F.col("_ch.url_canon").alias("url_canon"),
                F.col("_ch.host").alias("host"),
                F.col("priority").cast("int").alias("priority"),
                "discovered_ts",
                "src_host",
            )
            .where(F.col("url_canon").isNotNull())  # unparseable hrefs drop
            .withColumn("url_hash", F.xxhash64("url_canon"))
            .withColumn("host_bucket", _bucket(F.col("host"), cfg.n_buckets))
        )
        if cfg.host_rank_priority:
            # authority loop: boost discovered candidates by the LATEST
            # committed host_rank build (host-cardinality dim — broadcast
            # below a host-count threshold, AQE decides above it; never a
            # corpus shuffle). Seeds (src_host null) are never boosted AND
            # never clamped — the min(100, ·) cap applies only to non-seed
            # candidates, and it applies from cycle 1 even before the first
            # rank build (boost 0), exactly like the refspec mirror (a
            # seed priority > 100 must survive in both).
            from .graph import PR_SCALE, hint_small_dim

            latest = self._latest_host_rank(cycle)
            if latest is not None:
                build_c, rank_df = latest
                # the limit+count broadcast gate is a Spark job; cache the
                # hinted dim keyed on the BUILD cycle so cycles between
                # rank builds reuse it instead of re-counting the same
                # committed parquet every cycle
                cached = getattr(self, "_rank_dim_cache", None)
                if cached is not None and cached[0] == build_c:
                    rdim = cached[1]
                else:
                    rdim = hint_small_dim(
                        rank_df.select(F.col("host").alias("_rh"), "rnk")
                    )
                    self._rank_dim_cache = (build_c, rdim)
                cand = cand.join(
                    rdim, cand.host == rdim._rh, "left"
                )
                boost = F.least(
                    F.lit(2), F.expr(f"coalesce(rnk, 0) div {PR_SCALE}")
                )
            else:
                boost = F.lit(0)
            cand = cand.withColumn(
                "priority",
                F.when(
                    F.col("src_host").isNotNull(),
                    F.least(F.lit(100), F.col("priority") + boost),
                )
                .otherwise(F.col("priority"))
                .cast("int"),
            )
            if latest is not None:
                cand = cand.drop("_rh", "rnk")
        _p(cand)
        tick("ingest: candidates", cand)

        # within-batch dedup: keep max priority per key (all other columns
        # are functionally determined by the key within one batch)
        def _dedup_g(df):
            return df.groupBy("url_hash").agg(
                F.min("url_canon").alias("url_canon"),
                F.min("host").alias("host"),
                F.min("host_bucket").alias("host_bucket"),
                F.max("priority").alias("priority"),
                F.min("discovered_ts").alias("discovered_ts"),
            )

        # seen dedup: cuckoo prefilter (definite-negatives bypass the exact
        # anti-join; possibles are confirmed exactly — membership.py).
        # The probe runs BEFORE the dedup agg: mapInPandas does not report
        # its child's partitioning, so the old agg -> probe -> anti-join
        # order re-shuffled the full candidate set a second time for the
        # join. Probing raw candidates first lets each branch's aggregation
        # exchange double as the anti-join's distribution — every candidate
        # row now crosses exactly ONE url_hash exchange. Exactness: all
        # rows of one url_hash share a filter classification (same hash,
        # same filter answer), so per-branch aggregation equals aggregating
        # before the split, row for row.
        tested_frame = None
        if fresh_start:
            # provably empty seen-set: every grouped candidate is new
            new_keys = _dedup_g(cand)
        elif cfg.use_seen_filter:
            from .membership import split_by_filter

            definite_new, maybe_seen, tested_frame = split_by_filter(
                cand, io, cycle - 1, cfg
            )
            if tested_frame is not None:  # persisted inside split_by_filter;
                # None when no filter shard exists yet (e.g. the previous
                # cycle ran with build_filters=False and none were ever
                # committed) — appending None would crash the finally
                tracked.append(tested_frame)
                confirmed_new = _dedup_g(maybe_seen).join(
                    seen, "url_hash", "left_anti"
                )
                new_keys = _dedup_g(definite_new).unionByName(confirmed_new)
            else:
                # no filter shard exists yet: split_by_filter returned
                # (empty, cand, None) — single agg + exact anti-join
                new_keys = _dedup_g(cand).join(seen, "url_hash", "left_anti")
        else:
            new_keys = _dedup_g(cand).join(seen, "url_hash", "left_anti")

        if ttl is not None and not fresh_start:
            # TTL mode: an expired seen row must not re-admit a URL that is
            # still in the frontier — anti-join on the pending keys (keys
            # only; pending is partitioned by host_bucket and this joins on
            # url_hash, the same key the dedup agg just shuffled on)
            new_keys = new_keys.join(
                pending_prev.select("url_hash"), "url_hash", "left_anti"
            )

        ingested = new_keys.select(
            "url_canon",
            "url_hash",
            "host",
            "host_bucket",
            "priority",
            F.col("discovered_ts").alias("crawl_ts"),
            "discovered_ts",
            F.lit(0).cast("int").alias("retries"),
        )
        _p(ingested)  # reused by pending union AND url_seen delta

        pending_all = (
            ingested if fresh_start else pending_prev.unionByName(ingested)
        )
        # not persisted: its ONLY consumer is the with_robots frame, which
        # is itself cached below — a second cache layer here would just pay
        # an extra full-frontier cache write+read per cycle
        tick("dedup+union pending", pending_all)

        # ---- 2. robots (SkipContainer analog) -----------------------------
        bucketed_window = politeness_salt <= 1
        with_robots = apply_robots(
            pending_all, self.robots, rfc=cfg.robots_rfc,
            small=self._robots_small,
        )
        # persist: three consumers (the ranked window build, the skipped
        # slice of the resolved write, and lineage's m_scan agg) — without
        # the cache each re-ran the robots rule join + path regex over the
        # full frontier (one pass per consumer per cycle)
        _p(with_robots)
        skipped = with_robots.where("blocked")
        eligible = with_robots.where("NOT blocked").drop("blocked")

        # ---- 3. politeness budget: per-host window rank --------------------
        # adaptive backoff: hosts whose previous cycle failed at >= pct%
        # get a halved budget this cycle (floor 1). The backoff dim is
        # bounded by the previous cycle's scheduled host count; inside
        # rank_by_budget it rides the same broadcast as the static budgets.
        budgets_dim = self.budgets
        if cfg.error_backoff_pct is not None and not fresh_start:
            hs = io.read_cycle(
                spark, "host_stats", cycle - 1, schemas.HOST_STATS
            )
            backoff_hosts = hs.where(
                (F.col("scheduled_n") > 0)
                & (
                    F.col("errors_n") * 100
                    >= F.lit(cfg.error_backoff_pct) * F.col("scheduled_n")
                )
            ).select("host")
            halved = backoff_hosts.join(
                self.budgets, "host", "left"
            ).withColumn(
                "budget",
                F.greatest(
                    F.lit(1),
                    F.floor(
                        F.coalesce("budget", F.lit(cfg.default_budget)) / 2
                    ),
                ).cast("int"),
            )
            budgets_dim = self.budgets.join(
                backoff_hosts, "host", "left_anti"
            ).unionByName(halved)
        # Single-window mode: repartition by host_bucket INSIDE the ranked
        # plan and window over (host_bucket, host) — host_bucket = f(host),
        # so the per-host rank is byte-identical, but the window's
        # ClusteredDistribution is satisfied by the in-plan partitioning
        # (subset rule) and no second exchange is planned. The repartition
        # must live in THIS plan, not below a persist: a cached subplan is
        # compiled under AQE (AdaptiveSparkPlan) and its InMemoryTableScan
        # reports UnknownPartitioning to consumers — partitioning reuse
        # never crosses a cache boundary here (measured: the window above
        # the cached frame re-exchanged regardless). The salted two-phase
        # window deliberately SPLITS a host across tasks and keeps its own
        # (host, salt) exchange.
        if bucketed_window:
            eligible = eligible.repartition(cfg.n_buckets, "host_bucket")
        ranked = rank_by_budget(
            eligible, budgets_dim, cfg.default_budget,
            salt=politeness_salt, bucketed=bucketed_window,
        )
        _p(ranked)
        tick("robots+budget window", ranked)
        # keep rk: it is the per-host crawl-order rank, reused below for
        # crawl-delay pacing (planned_fetch_ts)
        scheduled = ranked.where(F.col("rk") <= F.col("budget")).drop("budget")
        deferred = ranked.where(F.col("rk") > F.col("budget")).drop(
            "rk", "budget"
        )

        # ---- 4. fetch: co-partitioned join against pages, extract, links ---
        # join on the 64-bit key alone so the bucketed pages scan lines up
        # with the join distribution (pages side: NO exchange, html never
        # shuffles); the canonical-url equality is re-checked post-join
        # (64-bit collisions degrade to a fetch miss, never a wrong page)
        pages = self._pages_canon().select(
            "url_hash",
            F.col("url_canon").alias("page_canon"),
            "html",
            "text",
        )
        fetched = (
            scheduled.join(pages, "url_hash", "left")
            .withColumn("_h", handle_page_udf()(F.col("html")))
            .withColumn(
                # eqNullSafe on the extraction check: a NULL stored text
                # (PAGES_CANON allows it) made `ok` SQL-NULL, and a
                # NULL-ok row fell through BOTH where("ok") and
                # where("NOT ok") — the URL vanished from done AND miss
                # (no retry, no resolved row, already marked seen). A
                # NULL text now degrades to a fetch miss like any other
                # extraction mismatch (refspec asserts the invariant
                # instead — it never sees a NULL text without crashing)
                "ok",
                F.col("html").isNotNull()
                & (F.col("page_canon") == F.col("url_canon"))
                & F.col("_h.extracted").eqNullSafe(F.col("text")),
            )
            .withColumn("links", F.col("_h.links"))
        )
        if cfg.enrich_pages or cfg.ann_index:
            # keep the extracted text ONLY for the enrichment stages below
            fetched = fetched.withColumn("_text", F.col("_h.extracted"))
        # drop page bodies IMMEDIATELY — nothing downstream shuffles html
        fetched = fetched.drop("html", "text", "page_canon", "_h")
        _p(fetched)
        tick("fetch+extract", fetched)

        if os.environ.get("FRONTIER_EXPLAIN") == "1":
            # plan capture for docs/EXPLAIN.md (ingest->dedup->robots->
            # budget->fetch); persisted frames show as InMemoryRelation
            # with their child plans inline
            print(f"=== CYCLE {cycle} PIPELINE PLAN (fetched) ===", flush=True)
            fetched.explain("formatted")

        done = fetched.where("ok")
        miss = fetched.where("NOT ok")

        retriable = (
            miss.where(F.col("retries") < cfg.retry_limit)
            .select(*schemas.PENDING.fieldNames())
            .withColumn("retries", F.col("retries") + 1)
        )

        next_dts = T0 + timedelta(hours=cycle)
        discoveries_next = done.select(
            F.explode("links").alias("url"),
            F.greatest(
                F.col("priority") - cfg.link_priority_decay, F.lit(0)
            ).cast("int").alias("priority"),
            F.lit(next_dts).cast("timestamp").alias("discovered_ts"),
            F.col("host").alias("src_host"),
        )

        # ---- 5. outputs -----------------------------------------------------
        pending_next = deferred.select(
            *schemas.PENDING.fieldNames()
        ).unionByName(retriable)

        # fetch_seq: the total crawl order within a bucket. One window task
        # sorts a bucket's SCHEDULED slice — bounded by sum(budget(host))
        # over the bucket's hosts, NOT by the frontier (the politeness
        # budget caps it; the unbounded-pending skew case is already
        # two-phased in rank_by_budget). If a deployment's budgets make a
        # bucket's slice exceed task memory, raise n_buckets — the bound
        # scales as 1/n_buckets while the politeness semantics are
        # per-host and unaffected.
        wb = Window.partitionBy("host_bucket").orderBy(
            F.desc("priority"), F.asc("crawl_ts"), F.asc("url_hash")
        )
        # crawl-delay pacing: the host's k-th scheduled URL (rk, the
        # politeness-window rank) is planned at cycle_base + (rk-1) *
        # robots.crawl_delay_ms — broadcast dim join, no extra shuffle
        base_ts = (T0 + timedelta(hours=cycle - 1)).isoformat(sep=" ")
        delays = self.robots.select("host", "crawl_delay_ms")
        if self._robots_small:
            delays = F.broadcast(delays)

        def _with_seq(df):
            """fetch_seq + planned_fetch_ts over an already-partitioned
            frame: the window reuses the incoming hashpartitioning (its
            ClusteredDistribution(host_bucket) is satisfied), so the only
            sort is the window's own — which is exactly the queue order,
            making a separate sortWithinPartitions redundant (the rows
            reach the writer in (host_bucket, priority DESC, crawl_ts,
            url_hash) order, identical per bucket-dir to the old
            window→repartition→re-sort spelling, one Exchange + one Sort
            cheaper per cycle)."""
            return (
                df.withColumn("fetch_seq", F.row_number().over(wb))
                .join(delays, "host", "left")
                .withColumn(
                    "planned_fetch_ts",
                    F.expr(
                        "timestampadd(MILLISECOND, CAST((rk - 1) * "
                        "coalesce(crawl_delay_ms, 0) AS BIGINT), "
                        f"TIMESTAMP'{base_ts}')"
                    ),
                )
                .drop("crawl_delay_ms")
                .select(*schemas.SCHEDULED.fieldNames())
            )

        # the priority queue, physically: (salted) repartition + the window
        # sort. salt_factor > 1 splits hot buckets across tasks; fetch_seq
        # already carries the total crawl order, so salting never changes
        # results. In the salted case fetch_seq must still rank the WHOLE
        # bucket in one window task, so the salt split happens after it.
        scheduled_c = scheduled.withColumn("cycle", F.lit(cycle))
        # the explicit repartition stays: scheduled reads the RANKED CACHE,
        # and cached subplans report UnknownPartitioning (see the ranked
        # comment above) — without it EnsureRequirements would insert the
        # same exchange at shuffle.partitions width, under-parallelizing
        # the queue sort + partitioned write relative to n_buckets tasks
        seq_in = scheduled_c.repartition(cfg.n_buckets, "host_bucket")
        if salt_factor > 1:
            scheduled_out = (
                _with_seq(seq_in)
                .withColumn(
                    "_salt", F.pmod(F.col("url_hash"), F.lit(salt_factor))
                )
                .repartition(
                    cfg.n_buckets * salt_factor, "host_bucket", "_salt"
                )
                .sortWithinPartitions(
                    F.desc("priority"), F.asc("crawl_ts"), F.asc("url_hash")
                )
                .select(*schemas.SCHEDULED.fieldNames())
            )
        else:
            scheduled_out = _with_seq(seq_in)

        url_seen_delta = ingested.select(
            "url_hash",
            "host_bucket",
            F.lit(cycle).alias("first_seen_cycle"),
        )

        # done + errored in ONE pass over the fetched cache (same row set as
        # the two separate branch scans: ok -> done, terminal miss -> error;
        # retriable rows are excluded by the where), plus the skipped slice
        # of the persisted with_robots frame
        resolved = (
            fetched.where(
                F.col("ok") | (F.col("retries") >= cfg.retry_limit)
            )
            .select(
                F.lit(cycle).alias("cycle"), "url_hash", "host_bucket",
                F.when(F.col("ok"), F.lit("done"))
                .otherwise(F.lit("error"))
                .alias("state"),
            )
            .unionByName(
                skipped.select(
                    F.lit(cycle).alias("cycle"), "url_hash", "host_bucket",
                    F.lit("skipped").alias("state"),
                )
            )
        )

        lineage = _lineage_wide(
            cand, ingested, with_robots, ranked, fetched, cycle
        )

        # co-locate rows with their partition dir before the partitioned
        # writes — otherwise every upstream task writes into every
        # host_bucket dir (tiny-file explosion: tasks × buckets files)
        tables = {
            "pending": (
                pending_next.repartition(cfg.n_buckets, "host_bucket"),
                ["host_bucket"],
            ),
            "url_seen": (
                url_seen_delta.repartition(cfg.n_buckets, "host_bucket"),
                ["host_bucket"],
            ),
            "scheduled": (scheduled_out, ["host_bucket"]),
            "discoveries": (discoveries_next, None),
            "lineage": (lineage.coalesce(1), None),
            "resolved": (resolved.coalesce(8), None),
        }

        if cfg.error_backoff_pct is not None:
            # per-host outcomes of THIS cycle's fetch wave — tiny dim read
            # back next cycle to halve failing hosts' budgets
            tables["host_stats"] = (
                fetched.groupBy("host")
                .agg(
                    F.count(F.lit(1)).alias("scheduled_n"),
                    F.sum((~F.col("ok")).cast("long")).alias("errors_n"),
                )
                .coalesce(1),
                None,
            )

        # shared corpus projection for the value-add stages: the scalar
        # enrichment AND the ANN embedding/cell are fused into ONE
        # persisted pass over the cycle's fetched text (stage_frame) —
        # separate write jobs don't share plan subtrees, so unfused, the
        # page_stats and ann_index writes each re-ran their own
        # tokenize + higher-order-filter work over the cached rows (the
        # dominant interpreted per-row cost of a stage-stack cycle).
        # Consumers below only column-prune the warm cache.
        stage_frame = None
        if cfg.enrich_pages or cfg.ann_index:
            from .corpus import ann_enrich, enrich_scalars

            stage_frame = done.select("url_hash", "host_bucket", "_text")
            if cfg.enrich_pages:
                stage_frame = enrich_scalars(stage_frame, "_text")
            if cfg.ann_index:
                stage_frame = ann_enrich(stage_frame, "_text")
            stage_frame = stage_frame.drop("_text")
            _p(stage_frame)

        if cfg.enrich_pages:
            # training-data stage over this cycle's fetched corpus: the SAME
            # transform the driver's corpus_enrich query oracle-checks
            # (corpus.enrich), committed with everything else. Pure built-ins
            # + one banded LSH agg — no Python, no all-pairs join.
            from .corpus import band_keys, nd_group_join

            # materialize the MinHash band rows ONCE (persist): they feed
            # THREE consumers — page_stats' nd_group, the committed
            # nd_bands table, and (on closure cycles) the CC edge build —
            # and concurrent write jobs do not share exchanges, so an
            # unpersisted frame would re-run the whole shingle-explode +
            # signature pipeline per consumer (measured: the dominant cost
            # of a stage-stack bench cycle).
            nd_bands_full = _p(band_keys(
                done.select("url_hash", "_text"), "url_hash", "_text"
            ))
            pstats = nd_group_join(
                stage_frame, nd_bands_full, "url_hash"
            ).select(*schemas.PAGE_STATS.fieldNames())
            tables["page_stats"] = (
                pstats.repartition(cfg.n_buckets, "host_bucket"),
                ["host_bucket"],
            )
            # band rows ride along (~N_BANDS tiny rows per doc): the
            # cross-cycle near-dup closure below reads THESE, never the
            # corpus text again
            nd_bands_delta = nd_bands_full.select(
                *schemas.ND_BANDS.fieldNames()
            )
            tables["nd_bands"] = (nd_bands_delta.coalesce(8), None)

            if cfg.nd_closure_every and cycle % cfg.nd_closure_every == 0:
                # Near-dup closure over the accumulated corpus — engine
                # analog of handler dispatch over committed state
                # (base_handler.py ≈L48): edges = doc <-> min-doc of each
                # shared (band, bkey) bucket (star edges, never all-pairs
                # within a bucket), components via O(log n) star
                # contraction. Vertices come from accumulated page_stats
                # so shingle-less docs keep singleton components.
                #
                # INCREMENTAL from the second closure on: the previous
                # closure committed nd_components (a star forest — each
                # doc -> its component min) plus nd_buckets (each (band,
                # bkey) -> min _id ever seen in it). Seeding with those
                # two O(docs)/O(buckets) tables + ONLY the delta cycles'
                # band rows yields exactly the same components as a full
                # re-cluster (proof sketch: prev star edges preserve all
                # old connectivity; a delta band row links its doc to the
                # merged bucket min; a (prev-min -> merged-min) edge per
                # touched bucket reconnects the old cluster; every added
                # edge stays inside a true component, so the partition —
                # and the min labels — are identical; pinned by the
                # multi-closure union-find golden).
                from .graph import connected_components_star

                prev_closure = io.latest_table_cycle(
                    "nd_components", cycle - 1
                )
                if prev_closure is None:
                    delta_bands = io.read_appended(
                        spark, "nd_bands", cycle - 1, schemas.ND_BANDS
                    ).unionByName(nd_bands_delta)
                    prev_buckets = io._empty(spark, schemas.ND_BUCKETS)
                    prev_star = io._empty(
                        spark, schemas.ND_COMPONENTS
                    ).select(
                        F.col("url_hash").alias("src"),
                        F.col("nd_comp").alias("dst"),
                    )
                    verts = (
                        io.read_appended(
                            spark, "page_stats", cycle - 1,
                            schemas.PAGE_STATS,
                        )
                        .select("url_hash")
                        .unionByName(pstats.select("url_hash"))
                        .distinct()
                        .select(F.col("url_hash").alias("id"))
                    )
                    meta_nd_mode = "full"
                else:
                    delta_bands = io.read_delta_range(
                        spark, "nd_bands", prev_closure + 1, cycle - 1,
                        schemas.ND_BANDS,
                    ).unionByName(nd_bands_delta)
                    # nd_buckets is delta-committed (touched buckets only);
                    # the as-of view min-merges base + deltas. g only ever
                    # decreases across closures, so min over all deltas ==
                    # the latest closure's value for every bucket.
                    prev_buckets = (
                        io.read_appended(
                            spark, "nd_buckets", prev_closure,
                            schemas.ND_BUCKETS,
                        )
                        .groupBy("band", "bkey")
                        .agg(F.min("g").alias("g"))
                    )
                    prev_comp = io.read_cycle(
                        spark, "nd_components", prev_closure,
                        schemas.ND_COMPONENTS,
                    )
                    prev_star = prev_comp.where(
                        F.col("url_hash") != F.col("nd_comp")
                    ).select(
                        F.col("url_hash").alias("src"),
                        F.col("nd_comp").alias("dst"),
                    )
                    verts = (
                        prev_comp.select("url_hash")
                        .unionByName(
                            io.read_delta_range(
                                spark, "page_stats", prev_closure + 1,
                                cycle - 1, schemas.PAGE_STATS,
                            ).select("url_hash")
                        )
                        .unionByName(pstats.select("url_hash"))
                        .distinct()
                        .select(F.col("url_hash").alias("id"))
                    )
                    meta_nd_mode = "incremental"

                _p(delta_bands)  # consumed by newg, edges, count
                newg = delta_bands.groupBy("band", "bkey").agg(
                    F.min("_id").alias("ng")
                )
                pb = prev_buckets.select(
                    "band", "bkey", F.col("g").alias("pg")
                )
                merged = (
                    newg.join(pb, ["band", "bkey"], "full_outer")
                    .select(
                        "band",
                        "bkey",
                        F.least(
                            F.coalesce("ng", "pg"), F.coalesce("pg", "ng")
                        ).alias("g"),
                        "ng",
                        "pg",
                    )
                )
                _p(merged)
                edges = (
                    # delta docs -> merged bucket min
                    delta_bands.join(
                        merged.select("band", "bkey", "g"), ["band", "bkey"]
                    )
                    .select(F.col("_id").alias("src"), F.col("g").alias("dst"))
                    # previous closure's star forest (empty on full path)
                    .unionByName(prev_star)
                    # touched buckets: reconnect the old cluster min to the
                    # merged min (no-op rows g == pg are dropped by _canon)
                    .unionByName(
                        merged.where(
                            F.col("pg").isNotNull() & F.col("ng").isNotNull()
                        ).select(
                            F.col("pg").alias("src"), F.col("g").alias("dst")
                        )
                    )
                )
                comp, nd_rounds = connected_components_star(edges, verts)
                tables["nd_components"] = (
                    comp.select(
                        F.col("id").alias("url_hash"),
                        F.col("comp").alias("nd_comp"),
                    ).coalesce(8),
                    None,
                )
                # TOUCHED buckets only (round-5 verdict #3): a bucket with
                # no delta band row this closure kept g == pg, so omitting
                # it loses nothing — the next closure's min-merge read (and
                # the nd_buckets_base compaction) reconstruct the full
                # view. This keeps the closure's WRITE O(delta) to match
                # its O(delta) compute; the old full rewrite was O(corpus)
                # per closure (~N_BANDS rows per doc ever seen).
                nd_buckets_delta = merged.where(
                    F.col("ng").isNotNull()
                ).select("band", "bkey", "g")
                tables["nd_buckets"] = (nd_buckets_delta.coalesce(8), None)
                meta_nd_rounds = nd_rounds
                # closure-input bound for the manifest: incremental reads
                # O(delta) band rows, never O(history) (tiny count — the
                # frame is N_BANDS rows per delta doc)
                meta_nd_input = delta_bands.count()
            else:
                meta_nd_rounds = meta_nd_mode = meta_nd_input = None
                nd_buckets_delta = None
        else:
            meta_nd_rounds = meta_nd_mode = meta_nd_input = None
            nd_buckets_delta = None

        if cfg.ann_index:
            # ANN index over this cycle's fetched corpus: the SAME transform
            # the driver's ann_index_cells query oracle-checks
            # (corpus.ann_enrich) — deterministic hashed-word embedding +
            # coarse cell, all JVM built-ins (already computed once in the
            # shared stage_frame pass above). Partitioned by cell: a
            # similarity probe over the engine's own corpus is a
            # partition-pruned scan of one (or a few) cells.
            from .corpus import ANN_IVF_K, N_HYPER

            aidx = stage_frame
            meta_ann_qc = None
            retrain = False
            if cfg.ann_index_mode == "ivf":
                # trained coarse quantizer (round-4 verdict #4): seeded
                # quantized-integer k-means over a deterministic md5
                # sample of the docs; the 256-row centroid stats collect
                # driver-side (probe-metadata-sized) and come back as a
                # broadcast literal for the single full-corpus assignment
                # pass. The quantizer is PINNED: trained ONCE at the first
                # IVF build and reused verbatim by every later cycle, so
                # cell ids are comparable across cycles and the per-cycle
                # deltas consolidate into one whole-corpus index
                # (ann_index_base below). Stats are re-committed each
                # cycle (256 tiny rows) so "the quantizer in force at
                # cycle k" is always read_cycle(ann_centroids, k); the
                # manifest's ann_quantizer_cycle meta records which cycle
                # trained them. Golden vs ivf_py.
                from .corpus import ivf_assign_cells, ivf_train_collect

                retrain = (
                    cfg.ann_retrain_on_compact
                    and compact
                    and io.latest_table_cycle("ann_index", cycle - 1)
                    is not None
                )
                prev_cent = io.latest_table_cycle("ann_centroids", cycle - 1)
                cent_rows: list = []
                if retrain:
                    # quantizer refresh folded into the compaction this
                    # cycle already pays for: retrain over the ACCUMULATED
                    # corpus (previous index rows + this cycle's docs) and
                    # re-pin from here — the compact block below then
                    # re-assigns the whole base with these stats, so every
                    # committed dir (base@k + deltas>k) shares one cell
                    # vocabulary
                    ann_prev_idx = io.read_appended(
                        spark, "ann_index", cycle - 1, schemas.ANN_INDEX
                    )
                    cent_rows = ivf_train_collect(
                        ann_prev_idx.select("url_hash", "emb").unionByName(
                            aidx.select("url_hash", "emb")
                        ),
                        "url_hash",
                        sample_hex=cfg.ann_ivf_sample_hex,
                    )
                    meta_ann_qc = cycle
                elif prev_cent is not None:
                    cent_rows = sorted(
                        (r["k"], r["d"], r["s"], r["n"])
                        for r in io.read_cycle(
                            spark, "ann_centroids", prev_cent,
                            schemas.ANN_CENTROIDS,
                        ).collect()
                    )
                    pm = io.manifest(prev_cent) or {}
                    meta_ann_qc = pm.get("meta", {}).get(
                        "ann_quantizer_cycle", prev_cent
                    )
                if not cent_rows:
                    # first IVF build — or a degenerate pinned build that
                    # trained on an EMPTY first corpus (empty stats would
                    # drop every doc through the inner assignment join
                    # forever): (re)train here and pin from this cycle on
                    cent_rows = ivf_train_collect(
                        aidx, "url_hash", sample_hex=cfg.ann_ivf_sample_hex
                    )
                    meta_ann_qc = cycle
                aidx = ivf_assign_cells(spark, aidx, "url_hash", cent_rows)
                tables["ann_centroids"] = (
                    spark.createDataFrame(
                        cent_rows, schemas.ANN_CENTROIDS
                    ).coalesce(1),
                    None,
                )
                n_cells = ANN_IVF_K
            else:
                n_cells = 1 << N_HYPER
            ann_index_delta = aidx.select(*schemas.ANN_INDEX.fieldNames())
            tables["ann_index"] = (
                ann_index_delta.repartition(
                    n_cells * ANN_WRITE_SALT,
                    "cell",
                    F.pmod(F.col("url_hash"), F.lit(ANN_WRITE_SALT)),
                ),
                ["cell"],
            )
            if retrain:
                # the accumulated rows re-assigned under the RETRAINED
                # stats — the compact block writes these as the base, so
                # cells are consistent across base@k and every later delta
                ann_base_rows = (
                    ivf_assign_cells(
                        spark, ann_prev_idx, "url_hash", cent_rows
                    )
                    .select(*schemas.ANN_INDEX.fieldNames())
                    .unionByName(ann_index_delta)
                )
            else:
                ann_base_rows = None
        else:
            ann_index_delta = None
            ann_base_rows = None
            meta_ann_qc = None

        if cfg.host_rank_every:
            # host link-graph edges, harvested HERE because ingest already
            # paid the canonicalization: parent host -> canonical link
            # host, distinct (tiny: bounded by hosts^2, committed per
            # cycle). Every host_rank_every-th cycle, the fixed-point
            # integer PageRank (graph.integer_pagerank — the transform the
            # driver's host_pagerank query oracle-checks) runs over ALL
            # cycles' edges and commits host_rank. Output-only: the crawl
            # trace never depends on it (golden-pinned).
            host_edges_delta = (
                cand.where(
                    F.col("src_host").isNotNull()
                    & (F.col("src_host") != F.col("host"))
                )
                .select("src_host", F.col("host").alias("dst_host"))
                .distinct()
            )
            tables["host_edges"] = (host_edges_delta.coalesce(4), None)
            if cycle % cfg.host_rank_every == 0:
                from .graph import integer_pagerank

                all_edges = io.read_appended(
                    spark, "host_edges", cycle - 1, schemas.HOST_EDGES
                ).unionByName(host_edges_delta)
                ranks = integer_pagerank(
                    all_edges.select(
                        F.col("src_host").alias("src"),
                        F.col("dst_host").alias("dst"),
                    ),
                    tracked=tracked,
                )
                tables["host_rank"] = (ranks.coalesce(1), None)

        meta = {}
        if meta_nd_rounds is not None:
            # observability + the golden's O(log n) round-bound assertion;
            # nd_mode/nd_input_bands pin that a non-first closure consumed
            # only the delta cycles' band rows, not all history
            meta["nd_rounds"] = meta_nd_rounds
            meta["nd_mode"] = meta_nd_mode
            meta["nd_input_bands"] = meta_nd_input
        if meta_ann_qc is not None:
            # which cycle TRAINED the IVF quantizer in force this cycle —
            # pins (engine golden) that cycles after the first reuse the
            # pinned centroids instead of retraining, the property that
            # makes cell ids comparable across cycles
            meta["ann_quantizer_cycle"] = meta_ann_qc
        if cfg.auto_salt:
            meta["auto_salt"] = salt_factor  # observability + test hook
            # hottest-host share of this cycle's eligible frontier: feeds
            # the NEXT cycle's _auto_salt. One job over the persisted
            # ranked frame (map-side partial agg -> n_hosts -> 1 row).
            depth = (
                ranked.groupBy("host")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(
                    F.max("n").alias("mx"), F.sum("n").alias("tot")
                )
                .collect()[0]
            )
            meta["host_depth_max"] = int(depth["mx"] or 0)
            meta["host_depth_total"] = int(depth["tot"] or 0)
        if compact:
            full_seen = io.read_appended(
                spark, "url_seen", cycle - 1, schemas.URL_SEEN
            ).unionByName(url_seen_delta)
            # same tiny-file rule as every partitioned write above: the
            # delta side arrives hash-partitioned by url_hash (dedup agg),
            # so without the repartition the base write emits up to
            # tasks x n_buckets files — and this base is re-read by every
            # later cycle's seen scan
            tables["url_seen_base"] = (
                full_seen.repartition(cfg.n_buckets, "host_bucket"),
                ["host_bucket"],
            )
            # R16 analog (status pruning): consolidate resolved history the
            # same way, so the append-table read path never unions an
            # unbounded number of per-cycle delta dirs at 10^10-URL scale
            full_resolved = io.read_appended(
                spark, "resolved", cycle - 1, schemas.RESOLVED
            ).unionByName(resolved)
            tables["resolved_base"] = (full_resolved.coalesce(8), None)
            # the two newer accumulating tables compact on the same
            # cadence (round-4 verdict #6): rank builds and full-closure
            # fallbacks read O(1) dirs instead of O(cycles). Pure layout
            # change — the base is the exact union the read path would
            # have produced (incl. this cycle's delta, which read_appended
            # skips once a base exists at the same cycle).
            if cfg.host_rank_every:
                full_edges = io.read_appended(
                    spark, "host_edges", cycle - 1, schemas.HOST_EDGES
                ).unionByName(host_edges_delta)
                tables["host_edges_base"] = (full_edges.coalesce(4), None)
            if cfg.enrich_pages:
                full_bands = io.read_appended(
                    spark, "nd_bands", cycle - 1, schemas.ND_BANDS
                ).unionByName(nd_bands_delta)
                tables["nd_bands_base"] = (full_bands.coalesce(8), None)
            if cfg.enrich_pages and cfg.nd_closure_every:
                # nd_buckets is committed as touched-only deltas (the
                # closure's I/O matches its O(delta) compute); the read
                # path min-merges deltas per bucket, so the base is that
                # merged view — g only ever decreases, so min over all
                # deltas == the latest delta's value for every bucket.
                nb = io.read_appended(
                    spark, "nd_buckets", cycle - 1, schemas.ND_BUCKETS
                )
                if nd_buckets_delta is not None:
                    nb = nb.unionByName(nd_buckets_delta)
                tables["nd_buckets_base"] = (
                    nb.groupBy("band", "bkey")
                    .agg(F.min("g").alias("g"))
                    .coalesce(8),
                    None,
                )
            if cfg.ann_index and ann_index_delta is not None:
                # whole-corpus ANN consolidation (round-5 verdict #1): the
                # per-cycle ann_index deltas fold into ONE cell-partitioned
                # base on the same cadence, so a whole-corpus similarity
                # probe reads O(1) dirs x nprobe cells instead of O(cycles)
                # delta dirs. Cell ids are comparable across cycles by
                # construction (LSH cells are data-independent; IVF cells
                # come from the pinned quantizer above). Pure layout
                # change: the base is the exact union the read path would
                # have produced — recrawled URLs keep one row per fetch
                # (an index of fetches, like every append table here).
                # with ann_retrain_on_compact, the base rows were already
                # re-assigned under the freshly retrained quantizer (same
                # url_hash/emb content — only cells differ, and every
                # later delta uses the same new stats)
                full_idx = (
                    ann_base_rows
                    if ann_base_rows is not None
                    else io.read_appended(
                        spark, "ann_index", cycle - 1, schemas.ANN_INDEX
                    ).unionByName(ann_index_delta)
                )
                tables["ann_index_base"] = (
                    full_idx.repartition(
                        n_cells * ANN_WRITE_SALT,
                        "cell",
                        F.pmod(F.col("url_hash"), F.lit(ANN_WRITE_SALT)),
                    ),
                    ["cell"],
                )

        tick("plan outputs")
        # the lineage write goes FIRST, sequentially: its plan traverses every
        # persisted frame (cand, ingested, pending_all, ranked, fetched), so
        # writing it materializes all caches exactly once — the concurrent
        # writes that follow read warm caches instead of racing to recompute
        # the pipeline (persist() does not dedupe concurrent materialization).
        # nd_bands is warmed second for the same reason: its persisted band
        # rows feed page_stats' nd_group too, and the two writes racing
        # would each re-run the shingle+signature pipeline. ann_index is
        # warmed third: its write materializes the shared stage_frame
        # (scalar enrichment + embedding, fused in one pass), which the
        # concurrent page_stats write then reads warm.
        manifest = io.commit(
            cycle, tables, meta=meta,
            warm=("lineage", "nd_bands", "ann_index"),
        )
        tick("commit writes")

        if cfg.use_seen_filter and build_filters:
            # filter sidecars are advisory: they only serve LATER cycles'
            # dedup prefilter, and a missing/stale sidecar is patched by an
            # exact anti-join over the gap (split_by_filter). The driver
            # loop therefore skips the build when no subsequent cycle will
            # consume it (build_filters=False on a run's final cycle).
            from .membership import rebuild_filters

            # consolidate on the same cadence as url_seen_base compaction:
            # re-emit untouched buckets into this cycle's delta and prune
            # older filter dirs (the carry-forward would otherwise pin
            # arbitrarily old deltas forever)
            meta_update = rebuild_filters(
                spark, io, cycle, cfg, consolidate=compact
            )
            manifest = io.commit_meta_update(cycle, meta_update)
            tick("rebuild filters")

        lin_rows = io.read_cycle(
            spark, "lineage", cycle, schemas.LINEAGE
        ).collect()
        n_sched = sum(r["enqueued"] for r in lin_rows)
        tick("read lineage")

        # persisted frames are unpersisted by run_cycle's finally (tracked)
        return CycleResult(
            cycle=cycle,
            scheduled_rows=n_sched,
            manifest=manifest,
            lineage=[r.asDict() for r in lin_rows],
        )

    def run(self, cycles: int, start_cycle: int | None = None) -> list[CycleResult]:
        start = start_cycle if start_cycle is not None else self.io.latest_cycle() + 1
        return [
            self.run_cycle(k, build_filters=(k < start + cycles - 1))
            for k in range(start, start + cycles)
        ]
