"""Robots prefix filter + per-host politeness budget (window rank).

The robots filter is the engine's SkipContainer analog
(container_crawler/exceptions.py SkipContainer — a handler refusing a whole
container for a cycle; here a host's disallow rules excluding its URLs).
The budget window is the flagship ordering operator: per host, rank pending
URLs by (priority DESC, crawl_ts ASC, url_hash ASC) — a TOTAL order thanks
to the unique 64-bit hash tiebreak — and schedule the top `budget(host)`.

Both the robots table and the budget table are small dimensions -> broadcast
joins (never a shuffle of the big frontier side beyond the window itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def budgets_df(spark, budgets: dict[str, int]) -> DataFrame:
    """Politeness budgets as a broadcastable dimension (host, budget)."""
    rows = sorted(budgets.items())
    return spark.createDataFrame(rows, "host string, budget int")


def apply_robots(pending: DataFrame, robots: DataFrame) -> DataFrame:
    """Adds boolean ``blocked``: any robots disallow prefix matches the path.

    Hosts without a robots row are unblocked (left join, null-safe).
    """
    r = robots.select("host", "disallow")
    return (
        pending.join(F.broadcast(r), "host", "left")
        .withColumn("_path", F.parse_url("url_canon", F.lit("PATH")))
        .withColumn(
            "blocked",
            F.coalesce(
                F.exists("disallow", lambda d: F.col("_path").startswith(d)),
                F.lit(False),
            ),
        )
        .drop("disallow", "_path")
    )


def rank_by_budget(
    eligible: DataFrame, budgets: DataFrame, default_budget: int
) -> DataFrame:
    """Adds ``rk`` (per-host rank in crawl order) and ``budget``."""
    w = (
        Window.partitionBy("host")
        .orderBy(F.desc("priority"), F.asc("crawl_ts"), F.asc("url_hash"))
    )
    return (
        eligible.join(F.broadcast(budgets), "host", "left")
        .withColumn("budget", F.coalesce("budget", F.lit(default_budget)))
        .withColumn("rk", F.row_number().over(w))
    )
