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


def _key_hash(t: pa.Table, corpus_col: str, id_col: str):
    """Vectorized (corpus, document_id) composite key: the '\\x00'-joined key
    string built by an Arrow kernel, hashed to int64 by pandas' C siphash —
    no per-row Python f-strings. Returns (hash int64, key object ndarray)."""
    import pandas as pd

    joined = pc.binary_join_element_wise(
        t.column(corpus_col).cast(pa.string()),
        t.column(id_col).cast(pa.string()),
        "\x00",
    )
    keys = joined.to_numpy(zero_copy_only=False)
    # categorize=False: the categorize path factorizes through a C-string
    # khash that TRUNCATES at the embedded NUL separator ('a\\x00x' and
    # 'a\\x00a' collide); the direct siphash path is NUL-safe
    h = (pd.util.hash_array(keys, categorize=False)
         & np.uint64((1 << 63) - 1)).astype(np.int64)
    return h, keys


def _collect_documents(documents):
    """Broadcast build side, sorted by (key hash, key string): int64 hash
    lookup array, key strings (hash-collision verify), payload object arrays."""
    tabs = [
        t for t in (
            ray.get(r) for r in documents.map_batches(
                lambda t: t.select(["corpus", "document_id", "title", "text"]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ) if t.num_rows
    ]
    tbl = pa.concat_tables(tabs)
    h, keys = _key_hash(tbl, "corpus", "document_id")
    order = np.lexsort((keys, h))
    return (
        h[order],
        keys[order],
        tbl.column("document_id").to_numpy(zero_copy_only=False)[order],
        tbl.column("title").to_numpy(zero_copy_only=False)[order],
        tbl.column("text").to_numpy(zero_copy_only=False)[order],
    )


def _emit(base: pa.Table, si, li, dids, dtitles, dtexts) -> pa.Table:
    """Attach the flat src_*/label_* title+text columns and the nested
    document structs for resolved mention rows (si/li: build-side row index
    per kept row). The document ids are NOT re-emitted flat — the raw mention
    columns context_document_id/label_document_id already carry them."""
    out = base
    for prefix, idx in (("src", si), ("label", li)):
        out = out.append_column(f"{prefix}_title",
                                pa.array(dtitles[idx], type=pa.string()))
        out = out.append_column(f"{prefix}_text",
                                pa.array(dtexts[idx], type=pa.string()))
    for side, (prefix, idx) in (("source_document", ("src", si)),
                                ("label_document", ("label", li))):
        out = out.append_column(side, pa.StructArray.from_arrays(
            [pa.array(dids[idx], type=pa.string()),
             out[f"{prefix}_title"].combine_chunks(),
             out[f"{prefix}_text"].combine_chunks()],
            names=["document_id", "title", "text"],
        ))
    return out


def transform_mentions(mentions, documents, npart: int = 16,
                       plan: str | None = None,
                       broadcast_doc_limit: int = 2_000_000):
    """Denormalize mentions with their context + label documents
    (transform_zeshel.py:12-14's in-RAM dict lookups).

    Output = the mention's raw columns + flat ``src_title/src_text`` and
    ``label_title/label_text`` columns (the document ids already travel as
    the raw ``context_document_id``/``label_document_id`` columns) + nested
    ``source_document``/``label_document`` structs (the reference's output
    shape). Mentions referencing a missing document are DROPPED silently
    (the reference instead KeyErrors, transform_zeshel.py:13-14); audit the
    drop count with ``count_dropped`` (= mentions.count() - out.count()).

    Two size-gated plans, both producing identical rows (plan-agreement
    tested):

    - ``broadcast`` (documents <= broadcast_doc_limit — the reference's own
      regime: README.md:54 demands the corpus dict fit in >=20 GB RAM): the
      document projection ships once via ``ray.put`` keyed by an int64
      siphash of the '\\x00'-joined (corpus, document_id) key; each mention
      batch resolves both references with vectorized searchsorted probes
      plus a string-equality verify on the probe hit (hash collisions fall
      back to a scan over the colliding run only).
    - ``join``: two hash-shuffle joins on (corpus, document id) — mentions ⋈
      docs on the context key, then on the label key. One all-to-all each;
      the plan for corpora past single-node RAM.
    """
    if plan is None:
        plan = ("broadcast" if documents.count() <= broadcast_doc_limit
                else "join")
    if plan == "join":
        return _transform_mentions_join(mentions, documents, npart)

    hs, keys, doc_ids, titles, texts = _collect_documents(documents)
    ref = ray.put((hs, keys, doc_ids, titles, texts))

    def _attach(t: pa.Table) -> pa.Table:
        bh, bkeys, dids, dtitles, dtexts = ray.get(ref)

        def lookup(col):
            qh, qk = _key_hash(t, "corpus", col)
            idx = np.searchsorted(bh, qh)
            idx[idx >= bh.shape[0]] = 0
            hit = (bh[idx] == qh) & (bkeys[idx] == qk)
            # hash matched but string didn't: a collision run — scan the few
            # colliding entries only (64-bit siphash collisions are ~absent;
            # this loop exists for correctness, not the hot path)
            for i in np.flatnonzero((bh[idx] == qh) & ~hit):
                j = idx[i]
                while j < bh.shape[0] and bh[j] == qh[i]:
                    if bkeys[j] == qk[i]:
                        idx[i] = j
                        hit[i] = True
                        break
                    j += 1
            return idx, hit

        si, sh = lookup("context_document_id")
        li, lh = lookup("label_document_id")
        keep = np.flatnonzero(sh & lh)
        return _emit(t.take(pa.array(keep)), si[keep], li[keep],
                     dids, dtitles, dtexts)

    return mentions.map_batches(_attach, batch_format="pyarrow")


def _transform_mentions_join(mentions, documents, npart: int):
    """The scale plan: two hash-shuffle joins on the (corpus, document id)
    composite key (int64 siphash on both sides — identical to the broadcast
    plan's key) with a post-join key-STRING equality filter, so hash
    collisions resolve exactly like the broadcast plan's verified lookups
    and row resolution is identical. Assumes (corpus, document_id) uniquely
    keys the documents side — the reference's own invariant (dict insertion,
    transform_zeshel.py:49)."""
    from ..stages.common import safe_join, scrub_empty_blocks

    # NOTE on names: the join key must NOT be a name-prefix of the payload
    # columns — Ray 2.49's join renames right-side columns that extend the
    # key name (observed: key '__sk' turned payload '__sk_id' into
    # '____sk_id'); '__ks' / '__src_*' never collide that way
    def _docs_side(keyname: str, prefix: str):
        def _m(t: pa.Table) -> pa.Table:
            h, keys = _key_hash(t, "corpus", "document_id")
            return pa.table({
                keyname: pa.array(h),
                # the full key STRING travels with the hash so joined rows can
                # be verified — a 63-bit siphash collision would otherwise
                # silently attach the wrong document (the broadcast plan
                # verifies strings; the join plan must match it)
                f"__{prefix}_vkey": pa.array(keys, type=pa.string()),
                f"__{prefix}_id": t["document_id"].cast(pa.string()),
                f"__{prefix}_title": t["title"].cast(pa.string()),
                f"__{prefix}_text": t["text"].cast(pa.string()),
            })

        return documents.map_batches(_m, batch_format="pyarrow")

    def _mention_keys(t: pa.Table) -> pa.Table:
        hs, _ = _key_hash(t, "corpus", "context_document_id")
        hl, _ = _key_hash(t, "corpus", "label_document_id")
        t = t.append_column("__ks", pa.array(hs))
        return t.append_column("__kl", pa.array(hl))

    keyed = mentions.map_batches(_mention_keys, batch_format="pyarrow")
    j1 = safe_join(keyed, _docs_side("__ks", "src"), join_type="inner",
                   num_partitions=npart, on=("__ks",)).materialize()
    j2 = safe_join(j1, _docs_side("__kl", "lbl"), join_type="inner",
                   num_partitions=npart, on=("__kl",))

    def _finish_join(t: pa.Table) -> pa.Table:
        # post-filter on key-string equality: rows joined through a hash
        # collision (hash matched, key didn't) are dropped here, making the
        # join plan's row resolution identical to the broadcast plan's
        # collision handling (one vectorized compare per side)
        if t.num_rows:
            ks = pc.binary_join_element_wise(
                t.column("corpus").cast(pa.string()),
                t.column("context_document_id").cast(pa.string()),
                "\x00",
            )
            kl = pc.binary_join_element_wise(
                t.column("corpus").cast(pa.string()),
                t.column("label_document_id").cast(pa.string()),
                "\x00",
            )
            keep = pc.and_(pc.equal(ks, t.column("__src_vkey")),
                           pc.equal(kl, t.column("__lbl_vkey")))
            t = t.filter(keep)
        out = t.drop_columns([c for c in t.column_names if c.startswith("__")])
        for prefix, side in (("src", "src"), ("label", "lbl")):
            out = out.append_column(
                f"{prefix}_title", t[f"__{side}_title"].combine_chunks())
            out = out.append_column(
                f"{prefix}_text", t[f"__{side}_text"].combine_chunks())
        for struct_name, side, prefix in (
            ("source_document", "src", "src"), ("label_document", "lbl", "label"),
        ):
            out = out.append_column(struct_name, pa.StructArray.from_arrays(
                [t[f"__{side}_id"].combine_chunks(),
                 out[f"{prefix}_title"].combine_chunks(),
                 out[f"{prefix}_text"].combine_chunks()],
                names=["document_id", "title", "text"],
            ))
        return out

    # join outputs can carry degenerate zero-column empty blocks (Ray 2.49);
    # the scrub re-batches across blocks and drops them before the finisher
    return scrub_empty_blocks(j2).map_batches(_finish_join, batch_format="pyarrow")


def count_dropped(mentions, transformed) -> int:
    """Mentions dropped by transform_mentions for referencing a missing
    context or label document (the reference would KeyError instead)."""
    return mentions.count() - transformed.count()


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


def split_overlap(entities_a, entities_b, key_limit: int = 5_000_000,
                  plan: str | None = None) -> int:
    """|ids(a) ∩ ids(b)| — the split-disjointness audit (:69-74). Inputs are
    deduped entity tables (combine_entities output: unique document_id), so
    an inner join counts each intersecting id exactly once.

    Size-gated like every other plan pair (plan-agreement tested):

    - ``sets`` (combined ids <= key_limit): id projections collected to
      driver sets — one object round-trip, no shuffle.
    - ``join``: one hash-shuffle semi-join + distributed count; nothing
      id-shaped ever lands on the driver (a 10^9-entity corpus stays off
      the driver heap entirely)."""
    def _proj(ds):
        # zero-column empty blocks (Ray 2.49 groupby artifact) have no schema
        # to select from — skip them
        return ds.map_batches(
            lambda t: t.select(["document_id"]) if t.num_rows else t,
            batch_format="pyarrow",
        )

    if plan is None:
        plan = ("sets"
                if entities_a.count() + entities_b.count() <= key_limit
                else "join")
    if plan == "join":
        from ..stages.common import default_partitions, safe_join

        return safe_join(
            _proj(entities_a), _proj(entities_b), join_type="inner",
            num_partitions=default_partitions(), on=("document_id",),
        ).count()

    def ids(ds):
        out = set()
        for r in _proj(ds).to_arrow_refs():
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
