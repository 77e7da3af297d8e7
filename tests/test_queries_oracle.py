"""Oracle parity tests: every queries() entry with an oracle_sql() twin must
match DuckDB exactly (row count, column names, order-insensitive values) at
sf0.001 — the same gate the driver runs at sf0.01.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from anomaly_detection_in_time_series_data_spark import queries as q
from anomaly_detection_in_time_series_data_spark.tables import TABLE_NAMES

from conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(q.ORACLE))
def test_oracle_parity(spark, sf_dir, duck, name):
    sdf = q.QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(q.ORACLE[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _canon(sdf), _canon(odf)
    for col in a.columns:
        if a[col].dtype.kind == "f" or b[col].dtype.kind == "f":
            xa = a[col].astype(float).to_numpy()
            ya = b[col].astype(float).to_numpy()
            mask = ~(pd.isna(xa) & pd.isna(ya))
            assert (xa[mask] == ya[mask]).all(), f"float col {col} differs"
        else:
            assert (
                a[col].astype(str).to_numpy() == b[col].astype(str).to_numpy()
            ).all(), f"col {col} differs"


def test_every_query_runs(spark, sf_dir):
    for name, fn in q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
