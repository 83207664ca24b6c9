"""Deterministic (order-independent) numeric aggregation helpers.

Floating-point ``sum``/``avg`` over doubles are partition-order dependent:
the same query can hash differently run-to-run and engine-to-engine
(SURVEY.md §7 "float nondeterminism vs oracle"). Every golden query
therefore aggregates through fixed-point decimals — exact, associative,
order-independent — and casts the final result back to DOUBLE, which is a
deterministic conversion. DuckDB oracle SQL mirrors the same casts, so
values are bit-identical across engines.

Scale choice: input columns are money/quantity values with ≤2 decimal
digits; derived terms like ``extendedprice * (1-discount) * (1+tax)``
have ≤6. A DECIMAL(18,6) element representation is exact for all of
them (integer part up to 10^12 per row value) AND stays on Spark's
long-backed Decimal fast path (precision ≤ 18); Spark widens the sum
accumulator to DECIMAL(28,6), so 100 TB row counts cannot overflow.
Measured: (18,6) sums are ~25% faster than (22,6), which fall onto the
Int128/BigDecimal slow path.

This replaces nothing in the reference (it has no aggregation —
SURVEY.md §2.2); it is engine infrastructure for the declared surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Element type used before summation; see module docstring for why 18,6.
DEC = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    """Cast a numeric column/expression to the canonical exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def exact_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM over doubles, returned as DOUBLE.

    Oracle-SQL mirror: ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
    """
    return F.sum(dec(col)).cast("double").alias(alias)


def exact_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG as exact-sum / count, both sides DOUBLE.

    The division is a single IEEE double op — identical in Spark and
    DuckDB. Oracle mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def oracle_sum(expr: str) -> str:
    """DuckDB-side SQL fragment matching :func:`exact_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def oracle_avg(expr: str) -> str:
    """DuckDB-side SQL fragment matching :func:`exact_avg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
