"""Local DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate (see ``__spark_entry__`` docstring):
run the Spark query and the DuckDB oracle SQL over the same parquet
tables, sort columns by name, sort rows, and require exact value
equality. Keeping a local replica of the gate means every registered
query is verified *before* the driver ever sees it.

Adopted from the reference's test philosophy (SURVEY.md §5): golden
end-to-end assertions, not unit-mocked internals.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from kinesumer_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with every testdata table as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # tz-aware (Spark/UTC) vs naive (DuckDB) timestamps compare equal
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
        # unify pandas datetime resolutions (Spark→ns, DuckDB→us)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
                else v
            )
    sort_cols = [c for c in df.columns if df[c].map(lambda v: not isinstance(v, tuple)).all()]
    df = df.sort_values(by=sort_cols or list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == exact match)."""
    problems: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        # strict dtype parity: the driver compares schemas, so int32-vs-int64
        # drift between Spark and DuckDB must fail locally too
        if a[c].dtype != b[c].dtype:
            problems.append(
                f"dtype mismatch col {c!r}: spark={a[c].dtype} oracle={b[c].dtype}"
            )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_f = av.astype("float64")
            bv_f = bv.astype("float64")
            neq = ~(
                (av_f == bv_f)
                | (av_f.isna() & bv_f.isna())
                | (av_f.apply(math.isnan) & bv_f.apply(math.isnan))
            )
            if neq.any():
                i = int(neq.idxmax())
                diff = float((av_f - bv_f).abs().max())
                problems.append(
                    f"float col {c!r}: {int(neq.sum())} mismatches, "
                    f"max_abs_diff={diff:.3e}, first at row {i}: "
                    f"spark={av_f[i]!r} oracle={bv_f[i]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}"
                )
    return problems


def lint_output_schema(schema) -> list[str]:
    """Registered queries must not return array/map/struct columns.

    The driver's canonicalizer sorts every column through pandas
    ``sort_values``; complex-typed cells arrive as Python lists/dicts and
    crash it with ``unhashable type`` (bit us in r2 with
    ``scalar_array_funcs`` and again in r6 with ``scalar_regex_funcs``).
    Serialize such columns — ``array_join``/``to_json`` on the Spark
    side, ``array_to_string``/``to_json`` in the DuckDB oracle — before
    returning. This lint runs inside :func:`check_query`, so the rule is
    enforced over every registered query by the full-registry gate (224 queries at r7).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"output col {f.name!r} has complex type {f.dataType.simpleString()}: "
        "serialize it (array_join/to_json) — the driver canonicalizer "
        "cannot sort list/dict cells"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    """Run one registered query against its oracle; [] == pass."""
    from kinesumer_spark.registry import all_queries

    q = all_queries()[name]
    sdf = q.spark(spark, sf_dir)
    schema_problems = lint_output_schema(sdf.schema)
    if schema_problems:
        return schema_problems
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    return compare_frames(spark_pdf, run_oracle(q.oracle, sf_dir))
