"""Guard a representative subset of the queries() suite against the DuckDB
oracles at sf0.001 (the full sweep lives in tools/check_oracles.py and runs
at sf0.01 in the driver)."""

import hashlib
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

SUBSET = [
    "pricing_summary",
    "orders_per_nation",
    "per_group_topk",
    "windowed_events",
    "asof_events_orders",
    "dedup_documents_exact",
    "quality_score",
    "embedding_topk",
    "retrieval_rate",
]


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df) == 0:
        return 0, list(df.columns), ""
    rows = df.astype(str).agg("|".join, axis=1).sort_values().tolist()
    return len(df), list(df.columns), hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, oracle_con):
    import __ray_entry__ as em

    res = em.queries()[name](SF)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    ora = oracle_con.execute(em.oracle_sql()[name]).df()
    nr, cr, hr = _canon(res)
    no, co, ho = _canon(ora)
    assert nr == no, f"rows {nr} != {no}"
    assert cr == co, f"cols {cr} != {co}"
    assert hr == ho, "value hash mismatch"


def test_entry_smoke():
    import __ray_entry__ as em

    res = em.entry()
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    assert len(df) >= 0
    assert "cluster" in df.columns and "sha256" in df.columns
