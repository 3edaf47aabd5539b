"""Mimics the driver's correctness gate: run every catalog query in Spark AND
its DuckDB oracle SQL on the same parquet, compare row count, column names,
and order-insensitive values (sorted-row comparison with float rounding)."""

import math

import duckdb
import pytest

import lab02_citation_matching_and_entity_resolution_spark.queries_catalog_ext  # noqa: F401
from lab02_citation_matching_and_entity_resolution_spark.queries_catalog import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, float):
        if math.isnan(v):
            return None  # pandas renders SQL NULL ints as NaN floats
        return round(v, 4)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        s = v.isoformat()[:19]
        return None if s == "NaT" else s  # pandas renders SQL NULL ts as NaT
    return v


def _rowset(cols, rows):
    return sorted(
        tuple(_canon(r[c]) for c in cols) for r in rows
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_rows = [r.asDict() for r in sdf.collect()]
    s_cols = sdf.columns
    if spec.sql is None:
        assert len(s_rows) >= 0  # rows-only check (driver's weaker gate)
        return
    ddf = duck.sql(spec.sql).df()
    d_cols = list(ddf.columns)
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    d_rows = ddf.to_dict("records")
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    key = sorted(s_cols)
    assert _rowset(key, s_rows) == _rowset(key, d_rows), f"{name}: value mismatch"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_queries_emit_scalar_columns_only(spark, sf_dir, name):
    """The driver's canonicalizer pandas-sorts the result frame; array/map/struct
    columns are unhashable there and error the row (round-2 so5 failure). Reject
    them locally for every oracle-bearing query before the driver ever runs."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    spec = REGISTRY[name]
    if spec.sql is None:
        return  # rows-only queries never reach the driver's hash compare
    sdf = spec.fn(spark, sf_dir)
    bad = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: oracle-bearing query returns non-scalar columns {bad}; "
        "join/scalarize them (driver canonicalizer cannot hash lists)"
    )
