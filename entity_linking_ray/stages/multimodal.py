"""Multimodal (image/audio/video) columns: codecs + actor-pool stage plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata columns
— exactly how a 100 TB training-data pipeline carries them (decode happens in
workers, never on the driver; blocks stay small because payloads are wide).

The decode kernel is REAL for three public stdlib-decodable codecs:

- **PPM (P6)** binary RGB images — parsed header + raw raster (the format's
  spec is the netpbm man page; no PIL needed),
- **WAV PCM** 16-bit mono audio — via the stdlib ``wave`` module,
- **Y4M (YUV4MPEG2)** C444 video — parsed stream header + FRAME-delimited
  raw planes (stats are computed over the luma plane).

``StdlibDecoder`` dispatches on the payload's magic bytes. Codecs outside
this set (JPEG/PNG/MP3/H.264...) would require PIL/torchvision/librosa,
which this environment lacks — StdlibDecoder raises a clear error for them.
``FakeDecoder`` (a 16-byte header + seeded arrays) remains as a TEST DOUBLE
for plumbing tests that don't care about bytes. The decode-analog in the
reference is its tokenize-then-embed shape applied to binary columns
(/root/reference/src/zeshel_dataset.py:78-90 -> bi_encoder.py:39-60).

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


# --------------------------------------------------------------------------
# Real stdlib codecs: PPM (P6) / WAV PCM / Y4M (YUV4MPEG2 C444)
# --------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    h, w = pixels.shape[0], pixels.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Handles whitespace and '#'
    comments in the header per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(data) and data[pos: pos + 1].isspace():
            pos += 1
        if data[pos: pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos: pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # the single whitespace byte after maxval
    raster = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 samples -> WAV PCM mono 16-bit (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV PCM mono 16-bit -> (sample_rate, 1-D int16 samples)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only mono 16-bit PCM WAV is supported")
        frames = w.readframes(w.getnframes())
        return w.getframerate(), np.frombuffer(frames, dtype="<i2")


def encode_y4m(luma: np.ndarray, chroma: int = 128, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 luma -> YUV4MPEG2 C444 stream (flat U/V)."""
    f, h, w = luma.shape
    parts = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    uv = np.full(h * w, chroma, dtype=np.uint8).tobytes()
    for i in range(f):
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(luma[i], dtype=np.uint8).tobytes())
        parts.append(uv)
        parts.append(uv)
    return b"".join(parts)


def decode_y4m(data: bytes) -> np.ndarray:
    """YUV4MPEG2 C444 stream -> (n_frames, h, w) uint8 LUMA plane."""
    nl = data.index(0x0A)
    header = data[:nl].decode("ascii")
    fields = header.split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "C420"
    for fld in fields[1:]:
        if fld.startswith("W"):
            w = int(fld[1:])
        elif fld.startswith("H"):
            h = int(fld[1:])
        elif fld.startswith("C"):
            colorspace = fld
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if not colorspace.startswith("C444"):
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    plane = h * w
    pos, frames = nl + 1, []
    while pos < len(data):
        fnl = data.index(0x0A, pos)
        if data[pos: pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        pos = fnl + 1
        frames.append(np.frombuffer(data, dtype=np.uint8, count=plane, offset=pos))
        pos += 3 * plane  # Y + U + V
    return (np.stack(frames).reshape(len(frames), h, w)
            if frames else np.zeros((0, h, w), dtype=np.uint8))


class StdlibDecoder:
    """REAL decode kernel over the stdlib codecs, dispatched on magic bytes:
    ``P6`` -> PPM image, ``RIFF`` -> WAV audio, ``YUV4MPEG2`` -> Y4M video.
    Returns the same (kind, array) contract as FakeDecoder: image (h, w, 3)
    uint8, audio 1-D int16, video (n_frames, h, w) uint8 luma."""

    def decode(self, payload: bytes):
        if payload[:2] == b"P6":
            return "image", decode_ppm(payload)
        if payload[:4] == b"RIFF":
            return "audio", decode_wav(payload)[1]
        if payload[:9] == b"YUV4MPEG2":
            return "video", decode_y4m(payload)
        raise ValueError(
            "unsupported codec (magic %r): StdlibDecoder handles PPM/WAV/Y4M; "
            "JPEG/PNG/MP3-class codecs need PIL/librosa, absent here"
            % payload[:4]
        )


# back-compat alias: the "real" decoder IS the stdlib codec kernel now
RealDecoder = StdlibDecoder


class DecodeStage:
    """Actor-pool map_batches callable: decode payloads, emit shape + stats.

    Decoder built ONCE per actor (the analog of loading codecs / models).
    Use small batch_size for wide binary rows so batch x concurrency fits the
    worker heap (see LinkageConfig notes / ray guide on memory).
    """

    def __init__(self, decoder_cls=FakeDecoder):
        self.decoder = decoder_cls()

    @staticmethod
    def _round6(x: float) -> float:
        # DuckDB round() semantics (half away from zero) for the non-negative
        # means here — keeps the stats exactly SQL-comparable (multimodal_stats)
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, h, w, frames = [], [], [], []
        means, mins, maxs, nvals = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            kind, arr = self.decoder.decode(payload)
            kinds.append(kind)
            if kind == "image":
                h.append(arr.shape[0]); w.append(arr.shape[1]); frames.append(1)
            elif kind == "video":
                frames.append(arr.shape[0]); h.append(arr.shape[1]); w.append(arr.shape[2])
            else:
                h.append(1); w.append(arr.shape[0]); frames.append(1)
            means.append(self._round6(float(arr.mean())))
            mins.append(float(arr.min()))
            maxs.append(float(arr.max()))
            nvals.append(arr.size)
        out = batch.drop_columns(["payload"])  # decoded stats travel; bytes do not
        out = out.append_column("kind_decoded", pa.array(kinds))
        out = out.append_column("height", pa.array(h, type=pa.int32()))
        out = out.append_column("width", pa.array(w, type=pa.int32()))
        out = out.append_column("n_frames", pa.array(frames, type=pa.int32()))
        out = out.append_column("n_values", pa.array(nvals, type=pa.int64()))
        out = out.append_column("mean_value", pa.array(means, type=pa.float64()))
        out = out.append_column("min_value", pa.array(mins, type=pa.float64()))
        out = out.append_column("max_value", pa.array(maxs, type=pa.float64()))
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


def synth_codec_assets(ids) -> pa.Table:
    """REAL-codec asset table keyed on int ids: (asset_id, kind, payload).

    Every field of every asset is a CLOSED-FORM function of its id, so the
    decoded stats are exactly SQL-expressible (the multimodal_stats oracle):

    - ``id % 3 == 0`` -> PPM image, w = 16 + id%16, h = 8 + id%8, every pixel's
      channel c value = (id + 85*c) % 256
    - ``id % 3 == 1`` -> WAV audio, n = 200 + id%800 samples at 8 kHz, square
      wave: sample[i] = +A for even i, -A for odd, A = (id % 100) * 10
    - ``id % 3 == 2`` -> Y4M video, w = 8 + id%8, h = 8 + id%4,
      f = 2 + id%6 frames, constant luma = id % 256 (chroma 128)
    """
    ids = np.asarray(ids, dtype=np.int64)
    kinds, payloads = [], []
    for i in ids.tolist():
        m = i % 3
        if m == 0:
            w, h = 16 + i % 16, 8 + i % 8
            px = np.empty((h, w, 3), dtype=np.uint8)
            for c in range(3):
                px[:, :, c] = (i + 85 * c) % 256
            kinds.append("image")
            payloads.append(encode_ppm(px))
        elif m == 1:
            n = 200 + i % 800
            a = (i % 100) * 10
            s = np.full(n, a, dtype=np.int16)
            s[1::2] = -a
            kinds.append("audio")
            payloads.append(encode_wav(s, rate=8000))
        else:
            w, h, f = 8 + i % 8, 8 + i % 4, 2 + i % 6
            luma = np.full((f, h, w), i % 256, dtype=np.uint8)
            kinds.append("video")
            payloads.append(encode_y4m(luma))
    return pa.table({
        "asset_id": pa.array(ids),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, type=pa.binary()),
    })


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
