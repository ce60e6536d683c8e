"""Entry point 1 — the mention/entity transform pipeline.

Ray-Data re-expression of /root/reference/src/transform_zeshel.py:

- ``read_mentions_json`` / ``read_documents_json``: JSON-lines ingestion
  (ray.data.read_json; the reference reads line-delimited JSON at
  transform_zeshel.py:9-11,44-49).
- ``transform_mentions``: mentions ⋈ documents TWICE (context + label doc) —
  the reference's in-RAM dict lookups (:13-14) become a broadcast join: the
  document projection is collected once, ray.put as packed columns, and each
  mention batch resolves both lookups with sorted-array searchsorted (the
  corpus is the dimension side; the reference itself requires it to fit in
  RAM — README.md:54). Output carries flat src_*/label_* columns PLUS nested
  ``source_document``/``label_document`` structs matching the reference's
  output shape (:12-16).
- ``combine_entities``: per-split entity dedup (:30-33) — distinct label
  documents, keeper = the row itself (doc ids are unique).
- ``split_overlap``: the train/val/test entity-overlap audit (:69-74).
- ``tiny_split``: the deterministic development split (:57-63; the reference
  takes the first 100 in file order — distributed reads have no stable file
  order, so this takes the 100 smallest mention_ids, documented divergence).
- ``write_transformed``: mentions/entities emitted as JSON-lines (K1-K4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def read_mentions_json(path: str) -> "rd.Dataset":
    """JSON-lines mentions: mention_id, corpus, context_document_id,
    label_document_id, start_index, end_index, text, category."""
    return rd.read_json(path)


def read_documents_json(paths, corpus_names=None) -> "rd.Dataset":
    """Per-corpus JSON-lines documents (document_id, title, text); a
    ``corpus`` column is attached per input file, mirroring
    transform_zeshel.py:41-49's corpus-keyed dict."""
    if isinstance(paths, str):
        paths = [paths]
    if corpus_names is None:
        import os

        corpus_names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    parts = []
    for p, name in zip(paths, corpus_names):
        parts.append(rd.read_json(p).map_batches(
            lambda t, _n=name: t.append_column(
                "corpus", pa.array([_n] * t.num_rows, type=pa.string())
            ),
            batch_format="pyarrow",
        ))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _collect_documents(documents):
    """(corpus, document_id) -> packed sorted lookup arrays + payload lists."""
    tabs = [
        t for t in (
            ray.get(r) for r in documents.map_batches(
                lambda t: t.select(["corpus", "document_id", "title", "text"]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ) if t.num_rows
    ]
    tbl = pa.concat_tables(tabs)
    key = np.asarray(
        [f"{c}\x00{d}" for c, d in zip(
            tbl.column("corpus").to_pylist(), tbl.column("document_id").to_pylist()
        )],
        dtype=object,
    )
    order = np.argsort(key)
    return (
        key[order],
        tbl.column("document_id").take(pa.array(order)),
        tbl.column("title").take(pa.array(order)),
        tbl.column("text").take(pa.array(order)),
    )


def transform_mentions(mentions, documents, npart: int = 16):
    """Denormalize mentions with their context + label documents.

    Broadcast join: the (corpus, document_id)-keyed document table is shipped
    once via ray.put; each mention batch resolves both document references
    with two vectorized searchsorted probes. Scale note: the corpus dict is
    the reference's own in-RAM requirement (README.md:54 demands ≥20 GB for
    exactly this dict); past that, swap the lookup for two hash joins on
    (corpus, document_id) — same output, one shuffle each.
    """
    key, doc_ids, titles, texts = _collect_documents(documents)
    ref = ray.put((key, doc_ids.to_pylist(), titles.to_pylist(), texts.to_pylist()))

    def _attach(t: pa.Table) -> pa.Table:
        k, dids, dtitles, dtexts = ray.get(ref)
        corpus = t.column("corpus").to_pylist()

        def lookup(col):
            q = np.asarray(
                [f"{c}\x00{d}" for c, d in zip(corpus, t.column(col).to_pylist())],
                dtype=object,
            )
            idx = np.searchsorted(k, q)
            idx[idx >= k.shape[0]] = 0
            hit = k[idx] == q
            return idx, hit

        si, sh = lookup("context_document_id")
        li, lh = lookup("label_document_id")
        ok = sh & lh  # the reference KeyErrors on a missing doc; we drop+count
        keep = np.flatnonzero(ok)
        base = t.take(pa.array(keep))

        def struct(idx):
            sel = idx[keep]
            return pa.StructArray.from_arrays(
                [
                    pa.array([dids[i] for i in sel], type=pa.string()),
                    pa.array([dtitles[i] for i in sel], type=pa.string()),
                    pa.array([dtexts[i] for i in sel], type=pa.string()),
                ],
                names=["document_id", "title", "text"],
            )

        out = base.append_column("source_document", struct(si))
        return out.append_column("label_document", struct(li))

    return mentions.map_batches(_attach, batch_format="pyarrow")


def combine_entities(transformed, npart: int = 16):
    """Distinct label documents of a (transformed) mention split —
    transform_zeshel.py:30-33's dict-overwrite dedup as groupby-first
    (document ids are unique per doc, so any-wins == reference)."""
    def _flatten(t: pa.Table) -> pa.Table:
        lbl = t.column("label_document").combine_chunks()
        return pa.table({
            "document_id": lbl.field("document_id"),
            "title": lbl.field("title"),
            "text": lbl.field("text"),
        })

    flat = transformed.map_batches(_flatten, batch_format="pyarrow")

    def _dedup_local(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("document_id").to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        keep_sorted = np.empty(order.shape[0], dtype=bool)
        if order.shape[0]:
            s = ids[order]
            keep_sorted[0] = True
            keep_sorted[1:] = s[1:] != s[:-1]
        return t.take(pa.array(order[keep_sorted]))

    from ..stages.common import bucketed_map_groups

    def _part(t: pa.Table) -> np.ndarray:
        import zlib

        return np.asarray(
            [zlib.crc32(d.encode()) for d in t.column("document_id").to_pylist()],
            dtype=np.uint64,
        )

    return bucketed_map_groups(flat, ["document_id"], _dedup_local, npart, part_from=_part)


def split_overlap(entities_a, entities_b) -> int:
    """|ids(a) ∩ ids(b)| — the split-disjointness audit (:69-74). The id
    projections are tiny (entities are already deduped); collected as sets."""
    def ids(ds):
        out = set()
        # zero-column empty blocks (Ray 2.49 groupby artifact) have no schema
        # to select from — skip them
        for r in ds.map_batches(
            lambda t: t.select(["document_id"]) if t.num_rows else t,
            batch_format="pyarrow",
        ).to_arrow_refs():
            t = ray.get(r)
            if t.num_rows:
                out.update(t.column("document_id").to_pylist())
        return out

    return len(ids(entities_a) & ids(entities_b))


def tiny_split(transformed, n: int = 100):
    """Deterministic development split: the n smallest mention_ids
    (reference: first n in file order, transform_zeshel.py:58-60)."""
    return transformed.sort("mention_id").limit(n)


def write_transformed(transformed, entities, out_dir: str):
    """JSON-lines writers (K1-K4 analog of transform_zeshel.py:19-22,34-36)."""
    transformed.write_json(f"{out_dir}/mentions")
    entities.write_json(f"{out_dir}/entities")
