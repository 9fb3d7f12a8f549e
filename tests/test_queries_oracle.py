"""Driver-gate mirror: every SQL-checkable query must match its DuckDB oracle.

Runs at sf0.001 for speed (the driver runs sf0.01); compares row count,
column names, and order-insensitive values — the same contract as
CORRECTNESS_r{N}.json.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')".format(
                t=t, p=os.path.join(SF_DIR, t + ".parquet"),
            ),
        )
    return con


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def sql_query_names():
    import __ray_entry__ as entry

    return sorted(entry.oracle_sql())


@pytest.mark.parametrize("name", sql_query_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as entry

    result = entry.queries()[name](SF_DIR)
    engine_df = _normalize(_to_pandas(result))

    con = _oracle_con()
    oracle_df = _normalize(con.execute(entry.oracle_sql()[name]).fetchdf())

    assert list(engine_df.columns) == list(oracle_df.columns), (
        "column mismatch: {} vs {}".format(list(engine_df.columns), list(oracle_df.columns))
    )
    assert len(engine_df) == len(oracle_df), "row count mismatch"
    pd.testing.assert_frame_equal(engine_df, oracle_df, check_dtype=False)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as entry

    q = entry.queries()
    rows_only = sorted(set(q) - set(entry.oracle_sql()))
    for name in rows_only:
        result = q[name](SF_DIR)
        df = _to_pandas(result)
        assert df is not None, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as entry

    ds = entry.entry()
    df = _to_pandas(ds)
    assert len(df) >= 0
    assert list(df.columns) == ["h", "r", "t"]
    assert len(df) > 0
