"""Driver-contract conformance: every queries() entry with an oracle
must match DuckDB exactly (row count, column names, values) — the same
comparison the driver's CORRECTNESS gate performs, run at sf0.001.

Value canonicalization mirrors an order-insensitive value hash: columns
sorted by name, rows compared as a sorted multiset of stringified
tuples. Floats must be BIT-identical (the parity conventions in
__spark_entry__ exist precisely so that they are).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _canon(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        tuple(_canon_value(v) for v in row) for row in df.itertuples(index=False)
    )
    return cols, rows


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
# overflow beyond the driver's 50-query verification cap: identical
# compare, gated here instead of by the driver (VERDICT r3 #3)
EXTRA_KEYS = sorted(entrymod.extra_oracle_sql().keys())

ALL_QUERIES = {**entrymod.queries(), **entrymod.extra_queries()}
ALL_ORACLES = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}


def test_oracle_keys_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
    assert set(entrymod.extra_oracle_sql()) <= set(entrymod.extra_queries())
    # the driver registry must stay exactly at its verification cap
    assert len(entrymod.queries()) == 50


@pytest.mark.parametrize("name", ORACLE_KEYS + EXTRA_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(ALL_ORACLES[name]).df()
    s_cols, s_rows = _canon(spark_pdf)
    d_cols, d_rows = _canon(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first 3: " + (
        "; ".join(f"spark={a} duck={b}" for _, a, b in mismatches[:3])
    )


def test_rows_only_queries_run(spark):
    """Queries without an oracle — in BOTH pools — must still run and
    return a stable schema (e.g. the iterative bpe_merges)."""
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    for name in sorted(set(qs) - set(ALL_ORACLES)):
        if name.startswith("extract"):
            continue  # pipeline queries covered by test_pipeline_spark
        df = qs[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "lang" in df.columns and "n_docs" in df.columns
