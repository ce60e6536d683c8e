"""Tests: multimodal binary-column plumbing (stubbed decode) and ANN plans."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_linking_ray.stages.ann import brute_force_topk, ivf_topk
from entity_linking_ray.stages.multimodal import (
    FakeDecoder,
    RealDecoder,
    decode_media,
    embed_media,
    frame_sample,
    pack_fake_asset,
    resize_plan,
    synth_assets,
    unpack_fake_header,
)

SF = "/root/testdata/sf0.001"


def test_fake_asset_roundtrip():
    p = pack_fake_asset("video", 7, 320, 240, 30)
    kind, a, b, c, seed = unpack_fake_header(p)
    assert (kind, a, b, c, seed) == ("video", 320, 240, 30, 7)


def test_stdlib_codec_roundtrips():
    """PPM / WAV / Y4M encode->decode roundtrips are byte-exact; the decoder
    dispatches on magic bytes and rejects unknown codecs."""
    from entity_linking_ray.stages.multimodal import (
        StdlibDecoder,
        decode_ppm,
        decode_wav,
        decode_y4m,
        encode_ppm,
        encode_wav,
        encode_y4m,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    # header with a comment line (netpbm spec allows them)
    commented = b"P6\n# a comment\n9 5\n255\n" + px.tobytes()
    assert (decode_ppm(commented) == px).all()

    s = rng.integers(-30000, 30000, 333).astype(np.int16)
    rate, got = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000 and (got == s).all()

    luma = rng.integers(0, 256, (4, 6, 8), dtype=np.uint8)
    assert (decode_y4m(encode_y4m(luma)) == luma).all()

    dec = StdlibDecoder()
    assert dec.decode(encode_ppm(px))[0] == "image"
    assert dec.decode(encode_wav(s))[0] == "audio"
    assert dec.decode(encode_y4m(luma))[0] == "video"
    with pytest.raises(ValueError, match="unsupported codec"):
        dec.decode(b"\x89PNG\r\n\x1a\n....")
    assert RealDecoder is StdlibDecoder  # the real kernel IS the stdlib one


def test_codec_assets_decode_to_closed_form_stats():
    """synth_codec_assets' decoded stats equal the closed-form doc_id math the
    SQL oracle uses (multimodal_stats)."""
    from entity_linking_ray.stages.multimodal import StdlibDecoder, synth_codec_assets

    dec = StdlibDecoder()
    t = synth_codec_assets(np.arange(30))
    for aid, payload in zip(t.column("asset_id").to_pylist(),
                            t.column("payload").to_pylist()):
        kind, arr = dec.decode(payload)
        m = aid % 3
        if m == 0:
            v = [(aid + 85 * c) % 256 for c in range(3)]
            assert kind == "image" and arr.shape == (8 + aid % 8, 16 + aid % 16, 3)
            assert float(arr.mean()) == pytest.approx(sum(v) / 3)
            assert arr.min() == min(v) and arr.max() == max(v)
        elif m == 1:
            n, a = 200 + aid % 800, (aid % 100) * 10
            assert kind == "audio" and arr.shape == (n,)
            assert arr.max() == a and arr.min() == -a
        else:
            assert kind == "video"
            assert arr.shape == (2 + aid % 6, 8 + aid % 4, 8 + aid % 8)
            assert arr.min() == arr.max() == aid % 256


def test_decode_media_actor_pool():
    assets = synth_assets(30)
    out = decode_media(rd.from_arrow(assets), batch_size=8).materialize()
    rows = out.take_all()
    assert len(rows) == 30
    assert all("payload" not in r for r in rows)  # bytes dropped after decode
    for r in rows:
        assert r["kind"] == r["kind_decoded"]
        assert r["height"] >= 1 and r["width"] >= 1 and r["n_frames"] >= 1
    # determinism: second run identical
    rows2 = decode_media(rd.from_arrow(assets), batch_size=8).materialize().take_all()
    assert sorted((r["asset_id"], r["mean_value"]) for r in rows) == sorted(
        (r["asset_id"], r["mean_value"]) for r in rows2
    )


def test_embed_resize_framesample():
    assets = synth_assets(30)
    emb = embed_media(rd.from_arrow(assets)).materialize()
    for r in emb.take_all():
        v = np.frombuffer(r["media_emb"], dtype=np.float32)
        assert v.shape[0] == 64 and abs(np.linalg.norm(v) - 1.0) < 1e-3

    decoded = decode_media(rd.from_arrow(assets)).materialize()
    plan = resize_plan(decoded, max_side=128).take_all()
    for r in plan:
        assert max(r["target_h"], r["target_w"]) <= 128

    frames = frame_sample(decoded, every_k=7).take_all()
    assert len(frames) > 0
    vids = {r["asset_id"]: r["n_frames"] for r in decoded.take_all() if r["kind_decoded"] == "video"}
    import collections

    per_asset = collections.Counter(r["asset_id"] for r in frames)
    for aid, n in per_asset.items():
        assert n == -(-vids[aid] // 7)


def test_ivf_recall_vs_brute_force():
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    queries = emb.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 30)), batch_format="pyarrow"
    )
    bf = brute_force_topk(queries, emb, k=10).take_all()
    ivf = ivf_topk(queries, emb, k=10, n_cells=8, n_probe=4).take_all()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    assert np.mean(recalls) >= 0.5, f"IVF recall too low: {np.mean(recalls):.2f}"


def test_lsh_recall_vs_brute_force():
    from entity_linking_ray.stages.ann import lsh_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    queries = emb.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 30)), batch_format="pyarrow"
    )
    bf = brute_force_topk(queries, emb, k=10).take_all()
    lsh = lsh_topk(queries, emb, k=10, n_bits=6, n_tables=4).take_all()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    lsh_sets = {}
    for r in lsh:
        lsh_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(bf_sets[q] & lsh_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    assert np.mean(recalls) >= 0.5, f"LSH recall too low: {np.mean(recalls):.2f}"


def test_lsh_determinism_across_runs():
    """Hyperplanes derive from the seed alone — two independent plans over
    the same input return byte-identical rows."""
    from entity_linking_ray.stages.ann import lsh_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    queries = emb.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 10)), batch_format="pyarrow"
    )
    a = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos"])
        for r in lsh_topk(queries, emb, k=5, n_bits=6, n_tables=2).take_all()
    )
    b = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos"])
        for r in lsh_topk(queries, emb, k=5, n_bits=6, n_tables=2).take_all()
    )
    assert a == b


def test_brute_force_shard_merge_edges(ray_session):
    """Sharded brute-force merge edge cases: fewer candidates than k (the
    self row must fall out, not appear with -inf), ties broken by id asc,
    ranks dense per query."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from entity_linking_ray.stages.ann import brute_force_topk

    dim = 4
    ids = np.arange(5, dtype=np.int64)
    emb = np.eye(5, dim) + 0.1  # distinct but overlapping directions
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.astype(np.float64).ravel()), dim),
    })
    cands = rd.from_arrow(tbl)
    out = brute_force_topk(cands, cands, k=10).to_pandas()
    # k=10 > 4 available non-self neighbors: exactly 4 rows per query
    counts = out.groupby("query_id").size()
    assert (counts == 4).all(), counts
    # no self rows, no -inf scores
    assert (out["query_id"] != out["neighbor_id"]).all()
    assert np.isfinite(out["cos"]).all()
    # ranks are 1..4 per query
    for _, g in out.groupby("query_id"):
        assert sorted(g["rank"]) == [1, 2, 3, 4]


def test_ivf_payload_autosizing_end_to_end(monkeypatch):
    """Payload-contract stress probe: drive ivf_topk end-to-end with wide
    synthetic embeddings under a tiny per-bucket byte target so
    partitions_for_bytes MUST raise P above the base partition count (the
    auto-sizing is exercised for real, not just the max_bucket_bytes
    assert) — and the exhaustive result still equals brute force exactly."""
    import entity_linking_ray.stages.common as common
    from entity_linking_ray.stages.common import partitions_for_bytes as real_pfb

    chosen = []

    def tight_pfb(n_rows, bytes_per_row, base, **kw):
        p = real_pfb(n_rows, bytes_per_row, base, target_bucket_bytes=64 << 10)
        chosen.append((p, base))
        return p

    monkeypatch.setattr(common, "partitions_for_bytes", tight_pfb)

    rng = np.random.default_rng(7)
    n, dim = 1200, 64
    emb = rng.normal(size=(n, dim))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.astype(np.float64).ravel()), dim),
    })
    cands = rd.from_arrow(tbl)
    queries = cands.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 40)),
        batch_format="pyarrow",
    )
    # exhaustive (n_probe == n_cells) + float64 wire dtype == brute force
    ivf = ivf_topk(queries, cands, k=5, n_cells=32, n_probe=32,
                   num_partitions=4, pack_dtype=np.float64).to_pandas()
    assert chosen and chosen[0][0] > chosen[0][1], (
        f"auto-sizing not exercised: {chosen}")

    bf = brute_force_topk(queries, cands, k=5).to_pandas()
    key = ["query_id", "rank"]
    a = ivf.sort_values(key).reset_index(drop=True)
    b = bf.sort_values(key).reset_index(drop=True)
    assert (a["query_id"].values == b["query_id"].values).all()
    assert (a["neighbor_id"].values == b["neighbor_id"].values).all()
    np.testing.assert_allclose(a["cos"].values, b["cos"].values, atol=1e-9)
