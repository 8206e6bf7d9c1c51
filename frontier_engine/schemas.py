"""Fixed engine-internal schemas (SURVEY.md §1.2) — declared, never inferred."""

from __future__ import annotations

from pyspark.sql import types as T

PENDING = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("crawl_ts", T.TimestampType()),
        T.StructField("discovered_ts", T.TimestampType()),
        T.StructField("retries", T.IntegerType()),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("first_seen_cycle", T.IntegerType()),
    ]
)

SCHEDULED = T.StructType(
    [
        T.StructField("cycle", T.IntegerType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("fetch_seq", T.IntegerType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("crawl_ts", T.TimestampType()),
        T.StructField("retries", T.IntegerType()),
        # crawl-delay pacing: cycle_base + (per-host rank - 1) *
        # robots.crawl_delay_ms (0 when the host has no robots row)
        T.StructField("planned_fetch_ts", T.TimestampType()),
    ]
)

PAGE_STATS = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("fp", T.StringType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("avg_token_len", T.DoubleType()),
        T.StructField("stop_ratio", T.DoubleType()),
        T.StructField("est_bpe_tokens", T.LongType()),
        T.StructField("predicted_lang", T.StringType()),
        T.StructField("nd_group", T.LongType()),
    ]
)

ND_BANDS = T.StructType(
    [
        T.StructField("_id", T.LongType()),  # url_hash
        T.StructField("band", T.IntegerType()),
        T.StructField("bkey", T.StringType()),
    ]
)

ND_COMPONENTS = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("nd_comp", T.LongType()),
    ]
)

# per-closure bucket representatives: min _id ever seen in each MinHash
# (band, bkey) bucket through the committing closure cycle — the O(buckets)
# state that lets the NEXT closure run incrementally (delta bands + prev
# components + prev reps), instead of re-clustering all history
ND_BUCKETS = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bkey", T.StringType()),
        T.StructField("g", T.LongType()),
    ]
)

# trained-IVF centroid stats (cfg.ann_index_mode="ivf"): integer sums so a
# probe recomputes the exact same distances as the build (corpus.ivf_py)
ANN_CENTROIDS = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("d", T.IntegerType()),
        T.StructField("s", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

ANN_INDEX = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("cycle", T.IntegerType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("rows_scanned", T.LongType()),
        T.StructField("enqueued", T.LongType()),
        T.StructField("deduped", T.LongType()),
        T.StructField("errors", T.LongType()),
        T.StructField("robots_skipped", T.LongType()),
        T.StructField("discovered", T.LongType()),
        T.StructField("fetched_ok", T.LongType()),
    ]
)

# per-cycle per-host fetch outcomes (committed only when
# cfg.error_backoff_pct is set; drives next cycle's budget backoff)
HOST_STATS = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("scheduled_n", T.LongType()),
        T.StructField("errors_n", T.LongType()),
    ]
)

DISCOVERIES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("discovered_ts", T.TimestampType()),
        # parent page's host (null for seeds / pre-upgrade dirs): the
        # host-graph edge source harvested at ingest for host_rank
        T.StructField("src_host", T.StringType()),
    ]
)

HOST_EDGES = T.StructType(
    [
        T.StructField("src_host", T.StringType()),
        T.StructField("dst_host", T.StringType()),
    ]
)

HOST_RANK = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("rnk", T.LongType()),
    ]
)

RESOLVED = T.StructType(
    [
        T.StructField("cycle", T.IntegerType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("state", T.StringType()),
    ]
)

PAGES_CANON = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)
