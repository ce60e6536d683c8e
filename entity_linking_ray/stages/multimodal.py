"""Multimodal (image/audio/video) columns: schema + actor-pool stage plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata columns
— exactly how a 100 TB training-data pipeline carries them (decode happens in
workers, never on the driver; blocks stay small because payloads are wide).

The decode kernels themselves are STUBBED here: the sandbox has no
PIL/torchvision/librosa, so ``RealDecoder`` raises with a clear message and
the default ``FakeDecoder`` parses a deterministic 16-byte header
(kind, width/height/frames or sample counts) and materializes seeded arrays.
Everything Ray-side — schema, actor pools, per-kind dispatch, batch sizing,
output layout — is real and tested; a deployment swaps the decoder class.

Stages:
- ``DecodeStage``        payload -> shape metadata + decoded array stats
- ``MediaEmbedStage``    decoded payload -> fixed-dim embedding (seeded
                         projection — the media analog of the text encoder)
- ``resize_plan``        target-size math per row (vectorized)
- ``frame_sample``       video payloads -> every k-th frame index row
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MAGIC = b"ELRM"
_KINDS = {0: "image", 1: "audio", 2: "video"}
_KIND_IDS = {v: k for k, v in _KINDS.items()}


def pack_fake_asset(kind: str, seed: int, a: int, b: int, c: int = 0) -> bytes:
    """Deterministic fake media payload: 16-byte header + seeded bytes.

    image: a=width, b=height; audio: a=sample_rate, b=n_samples;
    video: a=width, b=height, c=n_frames.
    """
    header = _MAGIC + struct.pack("<BxHIhh", _KIND_IDS[kind], a & 0xFFFF, b, c, seed & 0x7FFF)
    rng = np.random.default_rng(seed)
    n = min(256, max(16, (a * b) % 4096))
    return header + rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def unpack_fake_header(payload: bytes) -> tuple[str, int, int, int, int]:
    if payload[:4] != _MAGIC:
        raise ValueError("not an ELRM fake asset")
    kind_id, a, b, c, seed = struct.unpack("<BxHIhh", payload[4:16])
    return _KINDS[kind_id], a, b, c, seed


class FakeDecoder:
    """Deterministic stand-in decoder: header -> (kind, shape, array)."""

    def decode(self, payload: bytes):
        kind, a, b, c, seed = unpack_fake_header(payload)
        rng = np.random.default_rng(seed)
        if kind == "image":
            arr = rng.random((b, a, 3), dtype=np.float32)
        elif kind == "audio":
            arr = rng.random(min(b, 65536), dtype=np.float32)
        else:  # video: (frames, h, w) grayscale
            arr = rng.random((max(1, c), b, a), dtype=np.float32)
        return kind, arr


class RealDecoder:  # pragma: no cover - requires media libs absent here
    def __init__(self):
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "media decode requires PIL/torchvision/librosa, not present in "
                "this environment; use FakeDecoder (default) for plumbing tests"
            ) from e


class DecodeStage:
    """Actor-pool map_batches callable: decode payloads, emit shape + stats.

    Decoder built ONCE per actor (the analog of loading codecs / models).
    Use small batch_size for wide binary rows so batch x concurrency fits the
    worker heap (see LinkageConfig notes / ray guide on memory).
    """

    def __init__(self, decoder_cls=FakeDecoder):
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, h, w, frames, means = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            kind, arr = self.decoder.decode(payload)
            kinds.append(kind)
            if kind == "image":
                h.append(arr.shape[0]); w.append(arr.shape[1]); frames.append(1)
            elif kind == "video":
                frames.append(arr.shape[0]); h.append(arr.shape[1]); w.append(arr.shape[2])
            else:
                h.append(1); w.append(arr.shape[0]); frames.append(1)
            means.append(float(np.round(arr.mean(), 6)))
        out = batch.drop_columns(["payload"])  # decoded stats travel; bytes do not
        out = out.append_column("kind_decoded", pa.array(kinds))
        out = out.append_column("height", pa.array(h, type=pa.int32()))
        out = out.append_column("width", pa.array(w, type=pa.int32()))
        out = out.append_column("n_frames", pa.array(frames, type=pa.int32()))
        out = out.append_column("mean_value", pa.array(means, type=pa.float64()))
        return out


class MediaEmbedStage:
    """Actor-pool embedder: decoded payload -> unit-norm embedding (seeded
    random projection of coarse array statistics — the media-tower analog of
    the text bi-encoder; weights built once per actor)."""

    def __init__(self, dim: int = 64, seed: int = 42, decoder_cls=FakeDecoder):
        self.decoder = decoder_cls()
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((32, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = []
        for payload in batch.column("payload").to_pylist():
            _, arr = self.decoder.decode(payload)
            flat = arr.ravel()
            stats = np.array(
                [flat[i::32][:64].mean() for i in range(32)], dtype=np.float32
            )
            e = stats @ self.w
            e /= max(float(np.linalg.norm(e)), 1e-12)
            embs.append(e.tobytes())
        out = batch.drop_columns(["payload"])
        return out.append_column("media_emb", pa.array(embs, type=pa.binary()))


def decode_media(ds, batch_size: int = 64, concurrency=(1, 8), decoder_cls=FakeDecoder):
    """Binary payloads are wide: small batches keep batch x pool in heap."""
    return ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_args=(decoder_cls,),
        concurrency=concurrency,
    )


def embed_media(ds, dim: int = 64, batch_size: int = 64, concurrency=(1, 8)):
    return ds.map_batches(
        MediaEmbedStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"dim": dim},
        concurrency=concurrency,
    )


def resize_plan(decoded, max_side: int = 224):
    """Vectorized per-row resize targets preserving aspect ratio."""

    def _plan(t: pa.Table) -> pa.Table:
        h = t.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        w = t.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, max_side / np.maximum(np.maximum(h, w), 1.0))
        return t.append_column(
            "target_h", pa.array(np.maximum(1, np.round(h * scale)).astype(np.int32))
        ).append_column(
            "target_w", pa.array(np.maximum(1, np.round(w * scale)).astype(np.int32))
        )

    return decoded.map_batches(_plan, batch_format="pyarrow", zero_copy_batch=True)


def frame_sample(decoded, every_k: int = 5):
    """Video rows -> one row per sampled frame index (flat_map-shaped)."""

    def _sample(t: pa.Table) -> pa.Table:
        ids, frames = [], []
        aid = t.column("asset_id").to_pylist()
        nf = t.column("n_frames").to_numpy(zero_copy_only=False)
        kinds = t.column("kind_decoded").to_pylist()
        for i in range(t.num_rows):
            if kinds[i] != "video":
                continue
            for f in range(0, int(nf[i]), every_k):
                ids.append(aid[i])
                frames.append(f)
        return pa.table({
            "asset_id": pa.array(ids, type=pa.int64()),
            "frame_index": pa.array(frames, type=pa.int64()),
        })

    return decoded.map_batches(_sample, batch_format="pyarrow")


def synth_assets(n: int, seed: int = 42) -> pa.Table:
    """Deterministic asset table: (asset_id, kind, payload binary)."""
    rng = np.random.default_rng(seed)
    kinds, payloads = [], []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            p = pack_fake_asset(kind, seed + i, int(rng.integers(64, 1024)), int(rng.integers(64, 1024)))
        elif kind == "audio":
            p = pack_fake_asset(kind, seed + i, 16000, int(rng.integers(1000, 100000)))
        else:
            p = pack_fake_asset(kind, seed + i, int(rng.integers(64, 320)), int(rng.integers(64, 240)), int(rng.integers(10, 120)))
        kinds.append(kind)
        payloads.append(p)
    return pa.table({
        "asset_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, type=pa.binary()),
    })
