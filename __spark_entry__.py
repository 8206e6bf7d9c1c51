"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in frontier_engine/queries.py (one entry per operator
from SURVEY.md §2 plus the training-data pipeline ops); the crawl engine
itself is frontier_engine/scheduler.py, golden-tested against the
single-threaded refspec in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: cycle-1 scheduled crawl batch of the frontier engine
    on the deterministic n=2000 fixture (sf0.001-equivalent scale)."""
    from frontier_engine.queries import q_crawl_schedule_c1

    return q_crawl_schedule_c1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from frontier_engine.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from frontier_engine.queries import REGISTRY

    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
