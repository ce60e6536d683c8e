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
