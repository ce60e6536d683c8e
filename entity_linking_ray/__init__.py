"""entity_linking_ray — a Ray-Data-native record-linkage / entity-resolution engine.

Built from scratch on ``ray.data.Dataset`` primitives (map_batches over zero-copy
Arrow, actor pools for stateful stages, groupby shuffles, hash-shuffle joins) with
the matching semantics of the reference bi-encoder entity linker
(david-wb/entity-linking): dense-embedding dot-product scoring
(reference src/bi_encoder.py:96, src/eval_zeshel.py:44), top-k candidate
retrieval (src/eval_zeshel.py:49) and retrieval-rate evaluation
(src/eval_zeshel.py:38-53) — generalized to MinHash-LSH blocking, salted
shuffles, pairwise scoring with Jaccard/Levenshtein fallbacks, and distributed
union-find transitive clustering over Parquet tables of source-code files
``(repo, path, commit, lang, content)``.

The library NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions are owned
by the caller (driver, tests' conftest fixture, bench.py).
"""

__version__ = "0.1.0"
