"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB — row count, column
names, and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith(("int", "uint", "Int")):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["n_docs"] > 0 and rows[0]["total_spans"] > 0


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_against_oracle(spark, ddb, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    got = df.toPandas()
    assert len(got) >= 0  # runs and has a stable schema
    if name not in ORACLES:
        assert len(got) > 0, f"rows-only query {name} returned empty"
        return
    expected = ddb.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(expected.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(expected.columns)}"
    )
    g, e = _normalize(got), _normalize(expected)
    assert len(g) == len(e), f"{name}: {len(g)} rows vs {len(e)}"
    pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-6)
