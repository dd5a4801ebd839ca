"""Driver-equivalent correctness harness: Ray queries vs DuckDB oracles.

Replicates the driver's comparison (sort columns by name, sort rows,
exact value equality) locally at sf0.001 so oracle drift is caught
before the driver runs at sf0.01.
"""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from gliner_cpp_ray.pipelines.queries import (
    KG_SEED,
    oracle_sql_for_corpus,
    queries,
)
from gliner_cpp_ray.sources.pages import corpus_dir_for, n_pages_for_sf

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def _as_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by value — but keep dtypes: the
    driver's compare hashes raw values, so an int64 12345 on the Ray
    side vs a float64 12345.0 from a DuckDB HUGEINT must FAIL here too
    (round-1 regression: the old harness normalized dtypes and missed
    three oracle-side HUGEINT artifacts the driver then flagged)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_hash_equivalent(name: str, got: pd.DataFrame, want: pd.DataFrame):
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert gk == wk, (
            f"{name}.{c}: dtype kind mismatch {got[c].dtype} vs {want[c].dtype}"
            " (the driver hashes raw values — int vs float is a hash fail)"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ORACLES = oracle_sql_for_corpus(corpus_dir_for(n_pages_for_sf(SF_DIR), KG_SEED))
WITH_ORACLE = sorted(set(queries()) & set(ORACLES))
ROWS_ONLY = sorted(set(queries()) - set(ORACLES))


def test_every_oracle_key_has_a_query():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(ray_session, name):
    got = _canon(_as_df(queries()[name](SF_DIR)))
    want = _canon(_duck(ORACLES[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    _assert_hash_equivalent(name, got, want)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    df = _as_df(queries()[name](SF_DIR))
    assert len(df) >= 0 and len(df.columns) > 0


def test_entry_smoke(ray_session):
    df = entrymod.entry()
    assert len(df) > 0
    assert {"subj_canon", "pred", "obj_canon", "weight"} <= set(df.columns)
