"""Registry of driver-checkable queries.

Each entry embodies one operator family from SURVEY.md §2 (or a
training-data-pipeline operator) over the synthetic /root/testdata tables,
paired with an ANSI-SQL oracle that DuckDB runs on the same parquet files.
Column names are aliased identically on both sides (driver hashes values
after sorting columns by name).

Entries whose semantics are not SQL-expressible (simhash, LSH-ANN,
streaming-stateful) carry ``oracle=None`` -> the driver records a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One driver-checkable query: a Spark callable and its DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL over the pre-registered views, or None
    survey_ref: str = ""  # SURVEY.md §2 operator id(s) this embodies


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ref: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    # import side-effect populates _REGISTRY
    from xmltoldmigration_spark.queries import (  # noqa: F401
        dedup,
        graph,
        kg,
        multimodal,
        relational,
        similarity,
        streamq,
        textstats,
    )

    return dict(_REGISTRY)
