"""Degenerate-corpus regression tests. Every case here has at some point
crashed the pipeline (zero-block datasets losing schemas inside Ray hash
joins, empty multi-block sets, etc.) — keep them."""

import pyarrow as pa
import pytest

import ray.data as rd

from entity_linking_ray.config import LinkageConfig
from entity_linking_ray.pipelines.linkage import link_dataset

CFG = LinkageConfig(shuffle_partitions=4)


def _corpus(rows):
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array(["a" * 40] * len(rows)),
            "lang": pa.array(["py"] * len(rows)),
            "content": pa.array([r[2] for r in rows]),
        }
    )


CASES = {
    "single_row": ([("r1", "a.py", "print('x')")], 1),
    "empty_content": ([("r1", "a.py", ""), ("r2", "b.py", ""), ("r3", "c.py", "x=1")], 2),
    "all_identical": ([(f"r{i}", f"f{i}.py", "same\n" * 4) for i in range(10)], 1),
    "unicode": (
        [("r1", "u.py", "ümläut \U0001F600 中文\n" * 5), ("r2", "u2.py", "ümläut \U0001F600 中文\n" * 5)],
        1,
    ),
    "two_near_dups": (
        [("r1", "a.py", "def f(x):\n  return x+1\n" * 8),
         ("r2", "b.py", "def f(x):\n  return x+1\n" * 8 + "# c")],
        1,
    ),
    "two_distinct": (
        [("r1", "a.py", "alpha beta gamma\n" * 4), ("r2", "b.py", "totally different words\n" * 4)],
        2,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_degenerate_corpus(name):
    rows, expect_clusters = CASES[name]
    out = link_dataset(rd.from_arrow(_corpus(rows)), CFG).materialize().take_all()
    assert len(out) == len(rows)
    assert len({r["cluster"] for r in out}) == expect_clusters


def test_round4_queries_empty_inputs(tmp_path):
    """Every round-4 operator returns an empty (or empty-aggregate) result on
    empty input tables instead of crashing (the ADVICE-class failure mode:
    np.concatenate([]) / lost schemas on zero-block datasets)."""
    import pyarrow.parquet as pq

    from entity_linking_ray.pipelines.queries import (
        q_embedding_quantize,
        q_gopher_repetition,
        q_props_extract,
        q_quantiles_extended,
        q_split_assign,
    )

    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
    }), tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    pq.write_table(pa.table({
        "event_type": pa.array([], type=pa.string()),
        "props": pa.array([], type=pa.string()),
    }), tmp_path / "events.parquet")
    pq.write_table(pa.table({
        "l_returnflag": pa.array([], type=pa.string()),
        "l_quantity": pa.array([], type=pa.float64()),
    }), tmp_path / "lineitem.parquet")

    from entity_linking_ray.pipelines.queries import q_median_quantity

    sf = str(tmp_path)
    assert len(q_median_quantity(sf)) == 0
    assert len(q_quantiles_extended(sf)) == 0
    assert q_split_assign(sf).count() == 0
    assert q_gopher_repetition(sf).count() == 0
    assert q_embedding_quantize(sf).count() == 0
    assert q_props_extract(sf).count() == 0


def test_lsh_topk_empty_inputs(tmp_path):
    """lsh_topk on an empty candidate set returns an empty typed result."""
    import ray.data

    from entity_linking_ray.stages.ann import lsh_topk

    empty = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(empty)
    assert lsh_topk(ds, ds, k=5).count() == 0


def test_embedding_near_dup_empty_input(tmp_path):
    """Empty embeddings table: the broadcast verify path must return an empty
    pair set, not crash in np.concatenate([])."""
    import pyarrow.parquet as pq

    from entity_linking_ray.pipelines.queries import q_embedding_near_dup

    t = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
        "label": pa.array([], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    assert q_embedding_near_dup(str(tmp_path)).count() == 0
