"""Deterministic synthetic source-code corpus with planted gold clusters.

Implements FIXTURES.md §B.2/§B.3: seeded generation of the
``(repo, path, commit, lang, content)`` input table (BASELINE.json
``input_hint``) with structure planted so ground truth is known by
construction:

- base files (templated functions with seeded identifier vocab) — cluster seeds
- exact duplicates (same content, other repo/path) — exercise sha256 collapse
- near duplicates (comment edits, blank-line/indent churn, small statement
  inserts — token-Jaccard kept high) — exercise LSH + scoring
- a hot boilerplate family (license header file near-duplicated into ~6% of
  repos with tiny edits) — exercises block salting
- distractors (same template, fully different identifier vocab) — police
  precision

Emits alongside: ``gold_clusters`` (row_id, cluster_id) and ``labeled_pairs``
(row_id_a, row_id_b, is_match) with both positives and hard negatives, per the
pairwise-F1 metric in BASELINE.json.

Everything derives from ``np.random.default_rng(seed)`` — no wall clock, no
PYTHONHASHSEED.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.hashing import row_id_hex

_LANGS = ["py", "js", "java", "c"]

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega acc buf cache calc "
    "chan child ctx cur data depth dst elem entry env err event field file "
    "flag frame graph group handle head hook idx info init item iter key kind "
    "label leaf limit line link list lock map mark mask max meta min mode "
    "node obj off opt out pad page pair param parent part path peek pos prev "
    "proc ptr queue rank rate raw ref reg res ring root row rule scan scope "
    "seed seg sel seq set shard sig size slot snap sort span spec src stack "
    "stat step store sum tab tag task temp term tick tile tmp token top total "
    "track tree trig unit user val vec view walk warp wave weight wide win "
    "word wrap zero zone"
).split()


@dataclass
class SynthSpec:
    n_clusters: int = 120
    seed: int = 42
    exact_dup_rate: float = 0.35  # fraction of clusters that get exact copies
    max_variants: int = 4
    n_distractor_groups: int = 20
    distractors_per_group: int = 4
    hot_fraction: float = 0.06  # fraction of total files that are boilerplate variants
    file_scale: int = 1  # multiplies functions-per-file (bench uses >1 for realistic sizes)


def _ident(rng: np.random.Generator) -> str:
    return "_".join(rng.choice(_WORDS, size=rng.integers(1, 3)))


def _base_file(rng: np.random.Generator, lang: str, template_seed: int, file_scale: int = 1) -> str:
    """A templated source file. Files sharing template_seed share structure
    (keywords/shape) but NOT identifiers unless the same vocab rng is used."""
    trng = np.random.default_rng(template_seed)
    n_funcs = int(trng.integers(3, 7)) * file_scale
    lines: list[str] = []
    mod = _ident(rng)
    if lang == "py":
        lines.append(f"import os")
        lines.append(f"import sys")
        lines.append("")
        for _ in range(n_funcs):
            fn = _ident(rng)
            args = ", ".join(_ident(rng) for _ in range(int(trng.integers(1, 4))))
            lines.append(f"def {fn}_{mod}({args}):")
            n_stmts = int(trng.integers(2, 6))
            for _ in range(n_stmts):
                a, b, c = _ident(rng), _ident(rng), _ident(rng)
                op = trng.choice(["+", "-", "*", "%"])
                lines.append(f"    {a} = {b} {op} {c}")
            lines.append(f"    return {_ident(rng)}")
            lines.append("")
    else:
        kw = {"js": ("function", "let", "//"), "java": ("static int", "int", "//"), "c": ("int", "int", "/*")}[lang]
        for _ in range(n_funcs):
            fn = _ident(rng)
            args = ", ".join(f"{kw[1]} {_ident(rng)}" for _ in range(int(trng.integers(1, 4))))
            lines.append(f"{kw[0]} {fn}_{mod}({args}) {{")
            for _ in range(int(trng.integers(2, 6))):
                a, b, c = _ident(rng), _ident(rng), _ident(rng)
                op = trng.choice(["+", "-", "*", "%"])
                lines.append(f"  {kw[1]} {a} = {b} {op} {c};")
            lines.append(f"  return {_ident(rng)};")
            lines.append("}")
            lines.append("")
    return "\n".join(lines)


def _near_variant(rng: np.random.Generator, content: str, lang: str) -> str:
    """Seeded light edits that keep token-shingle Jaccard high (>~0.72):
    blank-line churn, comment insertion, and at most one statement insert."""
    lines = content.split("\n")
    out: list[str] = []
    comment = "#" if lang == "py" else "//"
    for ln in lines:
        if rng.random() < 0.03 and ln.strip():
            out.append(f"{comment} {_ident(rng)} {_ident(rng)}")
        out.append(ln)
        if rng.random() < 0.04 and ln.strip() == "":
            out.append("")
    if rng.random() < 0.5 and len(out) > 5:
        pos = int(rng.integers(1, len(out) - 1))
        a, b = _ident(rng), _ident(rng)
        stmt = f"    {a} = {b}" if lang == "py" else f"  {a} = {b};"
        out.insert(pos, stmt)
    return "\n".join(out)


def _license_text(rng: np.random.Generator) -> str:
    paras = []
    for _ in range(6):
        paras.append(
            " ".join(_ident(rng).replace("_", " ") for _ in range(30)).upper()
        )
    return (
        "/*\n * Copyright (c) The Project Authors.\n * Licensed under the "
        "Apache License, Version 2.0.\n *\n * " + "\n * ".join(paras) + "\n */\n"
    )


def _commit(rng: np.random.Generator) -> str:
    return "".join(rng.choice(list("0123456789abcdef"), size=40))


def generate_corpus(spec: SynthSpec | None = None):
    """-> (corpus: pa.Table, gold_clusters: pa.Table, labeled_pairs: pa.Table).

    corpus columns: repo, path, commit, lang, content
    gold_clusters:  row_id, gold_cluster (int64 plant id)
    labeled_pairs:  row_id_a, row_id_b, is_match (bool)
    """
    spec = spec or SynthSpec()
    rng = np.random.default_rng(spec.seed)

    repos: list[str] = []
    paths: list[str] = []
    commits: list[str] = []
    langs: list[str] = []
    contents: list[str] = []
    gold: list[int] = []  # planted cluster id per row

    def emit(repo, path, lang, content, cluster):
        repos.append(repo)
        paths.append(path)
        commits.append(_commit(rng))
        langs.append(lang)
        contents.append(content)
        gold.append(cluster)

    cluster_members: dict[int, list[int]] = {}
    next_cluster = 0

    # --- base clusters: original + exact dups + near variants ---
    for ci in range(spec.n_clusters):
        lang = _LANGS[ci % len(_LANGS)]
        template_seed = 10_000 + int(rng.integers(0, 40))
        content = _base_file(rng, lang, template_seed, spec.file_scale)
        cid = next_cluster
        next_cluster += 1
        repo = f"org{ci % 13}/proj{ci}"
        emit(repo, f"src/main_{ci}.{lang}", lang, content, cid)
        members = [len(contents) - 1]
        if rng.random() < spec.exact_dup_rate:
            for _ in range(int(rng.integers(1, 3))):
                r2 = f"org{int(rng.integers(0, 13))}/fork{int(rng.integers(0, 997))}"
                emit(r2, f"vendor/copy_{ci}.{lang}", lang, content, cid)
                members.append(len(contents) - 1)
        for _ in range(int(rng.integers(0, spec.max_variants + 1))):
            var = _near_variant(rng, content, lang)
            r3 = f"org{int(rng.integers(0, 13))}/var{int(rng.integers(0, 997))}"
            emit(r3, f"lib/mod_{ci}_{int(rng.integers(0, 9999))}.{lang}", lang, var, cid)
            members.append(len(contents) - 1)
        cluster_members[cid] = members

    # --- distractor groups: same template seed, different vocab => must NOT match ---
    distractor_groups: list[list[int]] = []
    for gi in range(spec.n_distractor_groups):
        lang = _LANGS[gi % len(_LANGS)]
        template_seed = 20_000 + gi
        group_rows = []
        for _ in range(spec.distractors_per_group):
            content = _base_file(rng, lang, template_seed, spec.file_scale)
            cid = next_cluster
            next_cluster += 1
            emit(
                f"org{int(rng.integers(0, 13))}/dis{int(rng.integers(0, 997))}",
                f"src/gen_{gi}_{int(rng.integers(0, 9999))}.{lang}",
                lang,
                content,
                cid,
            )
            cluster_members[cid] = [len(contents) - 1]
            group_rows.append(len(contents) - 1)
        distractor_groups.append(group_rows)

    # --- hot boilerplate family: one license file, near-duplicated widely ---
    n_hot = max(4, int(spec.hot_fraction * len(contents)))
    license_base = _license_text(rng)
    hot_cid = next_cluster
    next_cluster += 1
    hot_members = []
    for hi in range(n_hot):
        if hi % 3 == 0:
            content = license_base  # exact copy
        else:
            content = _near_variant(rng, license_base, "c")
        emit(
            f"org{hi % 13}/hot{hi % 29}",
            f"LICENSE_{hi}.txt",
            "c",
            content,
            hot_cid,
        )
        hot_members.append(len(contents) - 1)
    cluster_members[hot_cid] = hot_members

    rid = row_id_hex(repos, paths, commits)
    assert len(set(rid)) == len(rid), "row_id collision in synthetic corpus"

    corpus = pa.table(
        {
            "repo": pa.array(repos),
            "path": pa.array(paths),
            "commit": pa.array(commits),
            "lang": pa.array(langs),
            "content": pa.array(contents),
        }
    )
    gold_tbl = pa.table(
        {"row_id": pa.array(rid), "gold_cluster": pa.array(gold, type=pa.int64())}
    )

    # --- labeled pairs: all intra-cluster positives (capped per cluster) +
    #     hard negatives from distractor groups and random cross-cluster picks.
    pa_a, pa_b, is_match = [], [], []
    prng = np.random.default_rng(spec.seed + 7)
    for cid, members in cluster_members.items():
        ms = members[:12]  # cap the hot cluster's quadratic pair count
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pa_a.append(rid[ms[i]])
                pa_b.append(rid[ms[j]])
                is_match.append(True)
    for group_rows in distractor_groups:
        for i in range(len(group_rows)):
            for j in range(i + 1, len(group_rows)):
                pa_a.append(rid[group_rows[i]])
                pa_b.append(rid[group_rows[j]])
                is_match.append(False)
    all_idx = np.arange(len(rid))
    for _ in range(len(pa_a) // 2):
        i, j = prng.choice(all_idx, size=2, replace=False)
        if gold[i] != gold[j]:
            pa_a.append(rid[i])
            pa_b.append(rid[j])
            is_match.append(False)
    pairs_tbl = pa.table(
        {
            "row_id_a": pa.array(pa_a),
            "row_id_b": pa.array(pa_b),
            "is_match": pa.array(is_match),
        }
    )
    return corpus, gold_tbl, pairs_tbl


def generate_corpus_parquet(
    out_dir: str,
    n_clusters: int,
    chunk_clusters: int = 5000,
    seed: int = 42,
    file_scale: int = 3,
) -> int:
    """Distributed corpus generation: one Ray task per chunk of clusters, each
    writing its own parquet shard (natural read parallelism + resumable —
    existing shards are skipped). Gold tables are not emitted (bench corpora
    only need the rows); chunks are namespaced so row ids never collide.
    Returns total rows. Deterministic in (seed, n_clusters, chunk_clusters,
    file_scale)."""
    import os

    import pyarrow.parquet as pq

    import ray

    os.makedirs(out_dir, exist_ok=True)
    n_chunks = -(-n_clusters // chunk_clusters)

    @ray.remote
    def _gen(ci: int) -> int:
        path = os.path.join(out_dir, f"chunk_{ci:05d}.parquet")
        if os.path.exists(path):
            return pq.read_metadata(path).num_rows
        spec = SynthSpec(
            n_clusters=min(chunk_clusters, n_clusters - ci * chunk_clusters),
            seed=seed + 1000 * ci,
            file_scale=file_scale,
        )
        corpus, _, _ = generate_corpus(spec)
        # namespace repo so (repo, path, commit) keys are chunk-unique
        import pyarrow.compute as _pc

        repo = _pc.binary_join_element_wise(
            pa.array([f"c{ci}"] * corpus.num_rows), corpus.column("repo").combine_chunks(), "/"
        )
        corpus = corpus.set_column(0, "repo", repo)
        tmp = path + ".tmp"
        pq.write_table(corpus, tmp, row_group_size=4096)
        os.replace(tmp, path)
        return corpus.num_rows

    return sum(ray.get([_gen.remote(ci) for ci in range(n_chunks)]))


def corpus_from_documents(sf_dir: str):
    """Map the driver's documents.parquet onto the input_hint corpus shape.

    (doc_id, text, lang, source, n_chars) -> (repo, path, commit, lang, content):
    repo=source, path=doc_{doc_id}, commit=sha1(doc_id) — deterministic, so the
    same documents table always yields the same corpus.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    doc_ids = t.column("doc_id").to_pylist()
    commits = [hashlib.sha1(str(d).encode()).hexdigest() for d in doc_ids]
    return pa.table(
        {
            "repo": t.column("source"),
            "path": pa.array([f"doc_{d}.txt" for d in doc_ids]),
            "commit": pa.array(commits),
            "lang": t.column("lang"),
            "content": t.column("text"),
        }
    )
