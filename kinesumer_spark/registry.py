"""Query registry: the single source of truth for the declared surface.

Every operator claimed in SURVEY.md §2.2 registers here as a named query
with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) when
SQL-expressible, an equivalent DuckDB oracle SQL string. The driver
contract (``__spark_entry__.py``) and the local pytest oracle harness
both read this registry, so "implemented" == "registered + oracle-green"
by construction.

Column-name discipline: the driver compare sorts columns by name before
hashing, so every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(
            name=name, spark=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every operator module (side-effect: registration) and return."""
    # Imports are deferred so `import kinesumer_spark` stays cheap.
    from kinesumer_spark.operators import (  # noqa: F401
        relational,
        relational2,
        windows,
        setops,
        groupings,
        aggregates,
        scalars,
        dedup,
        similarity,
        text,
        events_ops,
        multimodal,
        decode,
        reshape,
    )
    from kinesumer_spark.streaming import queries as streaming_queries  # noqa: F401

    return QUERIES
