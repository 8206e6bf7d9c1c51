"""Corpus enrichment — the training-data-pipeline stage of the engine.

The round-1 pipeline ops (fingerprint / language-ID / quality / token counts
/ MinHash-LSH near-dup) existed only as standalone driver queries; this
module is the shared transform that makes them an ENGINE stage: the
scheduler applies it to each cycle's successfully fetched pages and commits
a ``page_stats`` table through TableIO (scheduler.run_cycle, cfg
``enrich_pages``), and the driver query ``corpus_enrich`` applies the exact
same transform to the ``documents`` table where DuckDB can oracle-check
every column.

All columns are Spark built-ins (JVM-side, whole-stage codegen — no Python
in this stage) and each scales as a per-row projection plus one banded
groupBy/join for the near-dup group:

- fp:            md5 of lowercased alphanumeric-only text (exact dedup key)
- n_words / avg_token_len / stop_ratio: quality scoring
- est_bpe_tokens: BPE-ish length/4 token estimate
- predicted_lang: marker-token heuristic language ID
- nd_group:      near-dup group id = least id sharing ANY MinHash band
  bucket (one LSH hop; docs with no 3-gram shingles group with themselves).
  One hop is deliberate: the hop already links every pair the banded LSH
  would emit, which is what near-dup pruning needs. The full iterative
  closure exists as the driver query ``neardup_components``
  (queries.q_neardup_components): min-label propagation to a fixpoint,
  oracle-checked against a DuckDB recursive reachability CTE.

The reference has no analog (container-crawler hands rows to opaque
handlers, base_handler.py ≈L48); this is the north-star "what a 100-TB
training-data pipeline needs" surface built on the same engine tables.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PERM = 8   # minhash permutations
N_BANDS = 4  # bands of 2 rows each


def _shingles(text_col):
    """Word 3-gram shingles (empty array when < 3 words)."""
    words = F.split(text_col, " ")
    return F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.array_join(F.slice(words, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def enrich(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Append the enrichment columns to ``df`` (keyed by ``id_col``).

    Plan shape: one projection for the scalar stats; for nd_group one
    explode -> groupBy(band, bkey) -> min(id) -> per-id min — a banded
    aggregation whose fan-in is bounded by band-bucket size, never an
    all-pairs join.
    """
    idc = F.col(id_col)
    text = F.col(text_col)
    words = F.split(text, " ")
    stops = F.filter(words, lambda w: (w == "the") | (w == "a"))
    tech = F.filter(
        words, lambda w: (w == "spark") | (w == "query") | (w == "data")
    )
    scalars = df.select(
        "*",
        F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")).alias("fp"),
        F.size(words).cast("long").alias("n_words"),
        F.round(F.length(text) / F.size(words), 4).alias("avg_token_len"),
        F.round(F.size(stops) / F.size(words), 4).alias("stop_ratio"),
        F.ceil(F.length(text) / 4.0).cast("long").alias("est_bpe_tokens"),
        F.when(F.size(stops) * 10 >= F.size(words), F.lit("en"))
        .when(F.size(tech) * 10 >= F.size(words), F.lit("tech"))
        .otherwise(F.lit("other"))
        .alias("predicted_lang"),
    )

    # near-dup group: min id over shared MinHash band buckets (one hop)
    sh = df.select(idc.alias("_id"), F.explode(_shingles(text)).alias("s"))
    sig = sh.groupBy("_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"m{i}")
            for i in range(N_PERM)
        ]
    )
    bands = None
    for b in range(N_BANDS):
        part = sig.select(
            "_id",
            F.lit(b).alias("band"),
            F.md5(F.concat(F.col(f"m{2*b}"), F.col(f"m{2*b+1}"))).alias("bkey"),
        )
        bands = part if bands is None else bands.unionByName(part)
    groups = bands.groupBy("band", "bkey").agg(F.min("_id").alias("g"))
    doc_g = (
        bands.join(groups, ["band", "bkey"])
        .groupBy("_id")
        .agg(F.min("g").alias("nd_group"))
    )
    return (
        scalars.join(
            doc_g.withColumnRenamed("_id", id_col), id_col, "left"
        )
        .withColumn("nd_group", F.coalesce("nd_group", idc.cast("long")))
    )
