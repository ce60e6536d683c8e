"""Evaluation jobs: pairwise F1 vs labeled pairs, and retrieval rate @ k.

- ``pairwise_f1``: the BASELINE.json quality metric. Joins each labeled pair to
  the predicted cluster assignment of both its rows (two hash-shuffle joins)
  and reduces to precision/recall/F1 — no driver-side materialization of
  anything but the final counters.

- ``retrieval_rate``: the reference's quality aggregate
  (/root/reference/src/eval_zeshel.py:38-53): fraction of queries whose gold
  entity appears in the top-k dot-product candidates, for several k. The dense
  score matrix is computed per query-batch against a broadcast candidate
  matrix (``ray.put`` once) — the reference's single giant ``np.matmul``
  (eval_zeshel.py:44) becomes a streamed batched matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import LinkageConfig


def pairwise_f1(linked, labeled_pairs, cfg: LinkageConfig | None = None) -> dict:
    """linked: Dataset with (row_id, cluster); labeled_pairs: Dataset/Table with
    (row_id_a, row_id_b, is_match). Returns dict with precision/recall/f1/counts."""
    import ray.data

    cfg = cfg or LinkageConfig()
    if isinstance(labeled_pairs, pa.Table):
        labeled_pairs = ray.data.from_arrow(labeled_pairs)

    assign = linked.map_batches(
        lambda t: t.select(["row_id", "cluster"]), batch_format="pyarrow"
    )
    a = assign.map_batches(
        lambda t: t.rename_columns(["row_id_a", "cluster_a"]), batch_format="pyarrow"
    )
    b = assign.map_batches(
        lambda t: t.rename_columns(["row_id_b", "cluster_b"]), batch_format="pyarrow"
    )
    from ..stages.common import safe_join

    j = safe_join(labeled_pairs, a, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("row_id_a",))
    j = safe_join(j, b, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("row_id_b",))

    def _flags(t: pa.Table) -> pa.Table:
        pred = pa.compute.equal(t["cluster_a"], t["cluster_b"])
        gold = t["is_match"]
        pred_np = pred.to_numpy(zero_copy_only=False)
        gold_np = gold.to_numpy(zero_copy_only=False) if hasattr(gold, "to_numpy") else np.asarray(gold)
        return pa.table(
            {
                "tp": pa.array([int(np.sum(pred_np & gold_np))]),
                "fp": pa.array([int(np.sum(pred_np & ~gold_np))]),
                "fn": pa.array([int(np.sum(~pred_np & gold_np))]),
                "tn": pa.array([int(np.sum(~pred_np & ~gold_np))]),
            }
        )

    flags = j.map_batches(_flags, batch_format="pyarrow")
    tp = flags.sum("tp")
    fp = flags.sum("fp")
    fn = flags.sum("fn")
    tn = flags.sum("tn")
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-12, precision + recall)
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }


def retrieval_rate(
    queries,
    candidates,
    ks: tuple[int, ...] = (1, 4, 8, 16, 32, 64),
    query_emb_col: str = "emb",
    cand_emb_col: str = "emb",
    query_gold_col: str = "gold_id",
    cand_id_col: str = "cand_id",
    exclude_self: bool = False,
    query_id_col: str | None = None,
) -> dict[int, float]:
    """Reference eval_zeshel.py:38-53 semantics over Datasets.

    candidates (small side: the entity table) are materialized once and
    broadcast via ray.put; queries stream through a batched matmul + argpartition
    top-k. Ties broken by candidate id ascending (deterministic, unlike the
    reference's argsort on ties — SURVEY.md §7.3).
    """
    if isinstance(candidates, pa.Table):
        cand_tbl = candidates
    else:
        # the candidate/entity side is the small side by contract: collect once,
        # broadcast once (ray.put below), never re-ship per batch
        proj = candidates.map_batches(
            lambda t: t.select([cand_id_col, cand_emb_col]), batch_format="pyarrow"
        )
        cand_tbl = pa.concat_tables(
            [ray.get(r) for r in proj.to_arrow_refs()]
        )
    cand_ids = np.asarray(cand_tbl.column(cand_id_col).to_pylist())
    cand_emb = np.stack(cand_tbl.column(cand_emb_col).to_numpy(zero_copy_only=False))
    order = np.argsort(cand_ids, kind="stable")
    cand_ids, cand_emb = cand_ids[order], cand_emb[order]
    ref = ray.put((cand_ids, cand_emb.astype(np.float32)))
    max_k = max(ks)

    def _hits(t: pa.Table) -> pa.Table:
        ids, emb = ray.get(ref)
        q = np.stack(t.column(query_emb_col).to_numpy(zero_copy_only=False)).astype(np.float32)
        gold = np.asarray(t.column(query_gold_col).to_pylist())
        scores = q @ emb.T  # batched analog of eval_zeshel.py:44
        if exclude_self and query_id_col is not None:
            qids = np.asarray(t.column(query_id_col).to_pylist())
            self_mask = ids[None, :] == qids[:, None]
            scores = np.where(self_mask, -np.inf, scores)
        k_eff = min(max_k, scores.shape[1])
        top = np.argpartition(-scores, kth=k_eff - 1, axis=1)[:, :k_eff]
        # order the top-k deterministically: score desc, candidate id asc
        rows = np.arange(scores.shape[0])[:, None]
        sub = scores[rows, top]
        ordr = np.lexsort((ids[top], -sub), axis=1)
        top = top[rows, ordr]
        out = {"n": pa.array([scores.shape[0]])}
        for k in ks:
            kk = min(k, k_eff)
            hits = (ids[top[:, :kk]] == gold[:, None]).any(axis=1)
            out[f"hits_{k}"] = pa.array([int(hits.sum())])
        return pa.table(out)

    flags = queries.map_batches(_hits, batch_format="pyarrow")
    n = flags.sum("n")
    return {k: flags.sum(f"hits_{k}") / max(1, n) for k in ks}
