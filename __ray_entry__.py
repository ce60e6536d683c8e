"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``     — flagship record-linkage pipeline over the sf0.001
                    documents table mapped onto the (repo, path, commit, lang,
                    content) corpus shape (BASELINE.json input_hint).
- ``queries()``   — one callable per implemented operator/pipeline from
                    SURVEY.md §2 plus the training-data-pipeline additions.
- ``oracle_sql()``— DuckDB-equivalent SQL for every SQL-expressible query;
                    genuinely non-SQL ops (MinHash-LSH candidates, IVF ANN,
                    multimodal decode, the full linkage pipeline) are
                    omitted -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> corpus ->
    fingerprint -> LSH blocking -> scoring -> union-find -> clusters."""
    import ray.data

    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.linkage import link_dataset
    from entity_linking_ray.sources.synthetic import corpus_from_documents
    from entity_linking_ray.stages.common import default_partitions

    corpus = ray.data.from_arrow(corpus_from_documents("/root/testdata/sf0.001"))
    return link_dataset(corpus, LinkageConfig(shuffle_partitions=default_partitions(8)))


def _linkage_clusters(sf_dir: str):
    """Full linkage pipeline over the documents-derived corpus (rows-only:
    MinHash/LSH blocking keys are not SQL-expressible)."""
    import ray.data

    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.linkage import link_dataset
    from entity_linking_ray.sources.synthetic import corpus_from_documents
    from entity_linking_ray.stages.common import default_partitions

    corpus = ray.data.from_arrow(corpus_from_documents(sf_dir))
    out = link_dataset(corpus, LinkageConfig(shuffle_partitions=default_partitions(16)))
    return out.map_batches(
        lambda t: t.select(["row_id", "sha256", "cluster"]),
        batch_format="pyarrow",
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from entity_linking_ray.pipelines.queries import QUERIES

    # linkage_clusters (the full flagship pipeline) FIRST: the driver's
    # correctness sweep records entries in registry order and caps around 50,
    # so the flagship proof must never fall off the tail.
    out: dict[str, Callable[[str], Any]] = {"linkage_clusters": _linkage_clusters}
    out.update(QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from entity_linking_ray.pipelines.queries import ORACLE_SQL, QUERIES

    # only expose oracles for registered queries (ORACLE_SQL may keep extra
    # entries, e.g. langid_accuracy, that are exercised directly in tests)
    return {k: v for k, v in ORACLE_SQL.items() if k in QUERIES}
