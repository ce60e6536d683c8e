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
    "tokenize_pad",
    "transform_mentions",
    "ngram_jaccard",
    "simhash_near_dup",
    "quantiles_extended",
    "split_assign",
    "gopher_repetition",
    "embedding_quantize",
    "props_extract",
    "quota_sample",
    "redact_props",
    "tfidf_topk",
    "hopping_window_events",
    "label_centroids",
    "pmi_bigrams",
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


def test_langid_accuracy_matches_oracle(oracle_con):
    """langid_accuracy was retired from the driver registry (derivable from
    `langid`, which stays registered) — its oracle check lives here instead."""
    from entity_linking_ray.pipelines.queries import ORACLE_SQL, q_langid_accuracy

    res = q_langid_accuracy(SF)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    ora = oracle_con.execute(ORACLE_SQL["langid_accuracy"]).df()
    assert _canon(res) == _canon(ora)


def test_entry_smoke():
    import __ray_entry__ as em

    res = em.entry()
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    assert len(df) >= 0
    assert "cluster" in df.columns and "sha256" in df.columns


def test_linkage_exact_clusters_refine_flagship():
    """Every exact (sha256) component from the SQL-checkable exact-clusters
    query lies wholly inside ONE flagship linkage cluster on the driver
    corpus — the flagship may merge further (near-dups), never split an
    exact component."""
    import collections

    import __ray_entry__ as em
    from entity_linking_ray.pipelines.queries import q_linkage_exact_clusters

    exact = q_linkage_exact_clusters(SF).to_pandas()
    flag = em.queries()["linkage_clusters"](SF).to_pandas()
    flag_by_sha = collections.defaultdict(set)
    for sha, cl in zip(flag["sha256"], flag["cluster"]):
        flag_by_sha[sha].add(cl)
    # group exact rows by their exact component; all members' shas must map
    # to the same single flagship cluster
    for comp, grp in exact.groupby("cluster"):
        clusters = set()
        for sha in grp["sha256"]:
            clusters |= flag_by_sha[sha]
        assert len(clusters) == 1, (comp, clusters)


def test_tfidf_spill_plans_agree():
    """tfidf_topk: the plasma-pinned posting table and the parquet-spilled
    posting table (scale path, forced via spill_doc_limit=0) give identical
    results."""
    from entity_linking_ray.pipelines.queries import q_tfidf_topk

    a = q_tfidf_topk(SF).to_pandas()
    b = q_tfidf_topk(SF, spill_doc_limit=0).to_pandas()
    key = ["doc_id", "rk"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_anti_join_plans_agree():
    """customers_without_orders: the broadcast plan and the forced
    hash-shuffle anti-join plan return identical rows."""
    from entity_linking_ray.pipelines.queries import q_customers_without_orders

    a = q_customers_without_orders(SF).to_pandas()
    b = q_customers_without_orders(SF, broadcast_key_limit=0).to_pandas()
    key = ["c_custkey", "c_acctbal"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("c_custkey").reset_index(drop=True),
        b[key].sort_values("c_custkey").reset_index(drop=True),
    )


def test_cc_documents_plans_agree():
    """cc_documents: broadcast range-query plan == bucketed band-join plan."""
    from entity_linking_ray.pipelines.queries import q_cc_documents

    a = q_cc_documents(SF).to_pandas()
    b = q_cc_documents(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_semi_join_plans_agree():
    """customers_with_orders: broadcast plan == hash-shuffle semi-join plan."""
    from entity_linking_ray.pipelines.queries import q_customers_with_orders

    a = q_customers_with_orders(SF).to_pandas()
    b = q_customers_with_orders(SF, broadcast_key_limit=0).to_pandas()
    key = ["c_mktsegment", "n_customers"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("c_mktsegment").reset_index(drop=True),
        b[key].sort_values("c_mktsegment").reset_index(drop=True),
    )


def test_minhash_verify_plans_agree():
    """minhash_near_dup: broadcast shingle lookup == shingle hash-join plan."""
    from entity_linking_ray.pipelines.queries import q_minhash_near_dup

    a = q_minhash_near_dup(SF).to_pandas()
    b = q_minhash_near_dup(SF, broadcast_limit=0).to_pandas()
    cols = ["doc_a", "doc_b", "jaccard"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        b[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
    )


def test_ngram_jaccard_plans_agree():
    """ngram_jaccard: broadcast count lookup == count hash-join plan."""
    from entity_linking_ray.pipelines.queries import q_ngram_jaccard

    a = q_ngram_jaccard(SF).to_pandas()
    b = q_ngram_jaccard(SF, broadcast_limit=0).to_pandas()
    cols = ["doc_a", "doc_b", "jaccard"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        b[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
    )


def test_embedding_near_dup_plans_agree():
    """embedding_near_dup: broadcast cosine verify == embedding-join verify."""
    from entity_linking_ray.pipelines.queries import q_embedding_near_dup

    a = q_embedding_near_dup(SF).to_pandas()
    b = q_embedding_near_dup(SF, broadcast_limit=0).to_pandas()
    cols = ["vec_a", "vec_b"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_simhash_near_dup_plans_agree():
    """simhash_near_dup: broadcast sketch lookup == sketch hash-join plan."""
    from entity_linking_ray.pipelines.queries import q_simhash_near_dup

    a = q_simhash_near_dup(SF).to_pandas()
    b = q_simhash_near_dup(SF, broadcast_limit=0).to_pandas()
    cols = ["doc_a", "doc_b", "hamming"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        b[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
    )


def test_minhash_containment_and_recall():
    """Precision invariant: every minhash-verified pair is in the exact
    n-gram-Jaccard output (q_minhash_containment returns the empty set), and
    LSH candidate recall vs the exhaustive operator is measured."""
    from entity_linking_ray.pipelines.queries import (
        q_minhash_containment,
        q_minhash_near_dup,
        q_ngram_jaccard,
    )

    assert q_minhash_containment(SF).num_rows == 0
    mp = {(r["doc_a"], r["doc_b"]) for r in q_minhash_near_dup(SF).take_all()}
    ep = {(r["doc_a"], r["doc_b"]) for r in q_ngram_jaccard(SF).take_all()}
    assert mp <= ep
    recall = len(mp & ep) / max(1, len(ep))
    # cfg banding (16 bands x 8 rows over 128 perms) keeps candidate recall
    # high at tau=0.3 on this corpus; assert a conservative floor
    assert recall >= 0.8, recall
