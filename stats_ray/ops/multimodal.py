"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with struct metadata; decode /
resize / frame-sample are actor-pool map_batches stages. Decode is REAL for
container-decodable formats — PNG (8-bit, non-interlaced; stdlib zlib +
the public RFC 2083 filter algorithms) and binary PPM/PGM — and falls back
to PIL when installed (optional import). Formats needing external codec
libraries (JPEG/audio/video) raise NotImplementedError with a declared
reason when PIL is absent. `fake=True` keeps the deterministic
byte-statistics stand-in for oracle checks independent of any codec.

Scale notes: binary payloads force small `batch_size` (payload x batch x
concurrency must fit worker heaps) and a larger `target_max_block_size` so
blocks aren't split absurdly small; both are exposed as knobs here.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("sample_rate", pa.int32()), ("n_frames", pa.int32())])),
])


def synthesize_media(n: int = 256, seed: int = 5) -> Dataset:
    """Deterministic fake media table (stands in for a real binary source)."""
    def gen(t: pa.Table) -> pa.Table:
        ids = t["id"].to_pylist()
        rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
        for i in ids:
            rng = np.random.RandomState(seed * 100003 + i)
            kind = ("image", "audio", "video")[i % 3]
            size = int(rng.randint(1_000, 20_000))
            rows["media_id"].append(f"m{i:06d}")
            rows["kind"].append(kind)
            rows["payload"].append(rng.bytes(size))
            rows["meta"].append({"width": int(rng.randint(16, 512)),
                                 "height": int(rng.randint(16, 512)),
                                 "sample_rate": 16000 if kind == "audio" else 0,
                                 "n_frames": int(rng.randint(1, 300))
                                             if kind == "video" else 1})
        return pa.table(rows, schema=MEDIA_SCHEMA)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow",
                                         batch_size=64)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8, non-interlaced only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5): header tokens then raw samples."""
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":                      # comment to EOL
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    i += 1                                          # single whitespace
    w, h, maxval = (int(x) for x in toks)
    if maxval > 255:
        raise NotImplementedError("PPM: 16-bit samples unsupported")
    ch = 3 if b[:2] == b"P6" else 1
    arr = np.frombuffer(b, np.uint8, count=w * h * ch, offset=i)
    return arr.reshape(h, w, ch)


def _decode_png(b: bytes) -> np.ndarray:
    """Minimal PNG decode (public RFC 2083): 8-bit, non-interlaced,
    gray / RGB / gray+alpha / RGBA. Stdlib zlib inflate + the five
    per-scanline unfilter algorithms."""
    pos, idat = 8, []
    w = h = ch = None
    while pos < len(b):
        (length,) = _struct.unpack(">I", b[pos:pos + 4])
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = \
                _struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG: only 8-bit non-interlaced gray/RGB[A] supported "
                    f"(depth={depth} color={color} interlace={interlace})")
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int32)
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 2:                                # Up
            cur = (line + prev) & 255
        elif f in (1, 3, 4):                        # Sub / Average / Paeth
            cur = line
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                bb = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + bb) // 2
                else:
                    p = a + bb - c
                    pa_, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else \
                        (bb if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 255
        else:
            raise ValueError(f"PNG: unknown filter {f}")
        out[y] = cur
    return out.astype(np.uint8).reshape(h, w, ch)


def decode_image_bytes(b: bytes) -> np.ndarray:
    """Decode an encoded image payload to an (h, w, channels) uint8 array.
    PNG + binary PPM/PGM decode natively; anything else uses PIL when
    installed (optional import) and otherwise raises with the declared
    reason."""
    if b[:8] == _PNG_MAGIC:
        return _decode_png(b)
    if b[:2] in (b"P5", b"P6"):
        return _decode_ppm(b)
    try:
        import io

        from PIL import Image  # optional dependency
    except ImportError:
        raise NotImplementedError(
            "image decode for this format requires PIL, which is not "
            "installed in this container (PNG and binary PPM/PGM decode "
            "natively)")
    arr = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    return arr


REAL_FEATURES_TYPE = pa.struct([
    ("n_bytes", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
    ("channels", pa.int32()), ("mean_pixel", pa.float64()),
    ("digest", pa.string())])


class ImageDecode:
    """Actor-pool decode stage.

    fake=False (default) REALLY decodes image payloads (PNG / PPM natively,
    PIL for other formats when installed) and emits per-image pixel
    features; non-image kinds and undecodable formats raise. fake=True is
    the deterministic byte-stats stand-in used by the codec-independent
    oracle query."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            feats = []
            for mid, kind, p in zip(t["media_id"].to_pylist(),
                                    t["kind"].to_pylist(),
                                    t["payload"].to_pylist()):
                if kind != "image":
                    raise NotImplementedError(
                        f"{kind} decode requires codec libraries not in "
                        f"this container (media_id={mid}); filter to "
                        f"kind == 'image' upstream or use fake=True")
                img = decode_image_bytes(p)
                feats.append({
                    "n_bytes": len(p),
                    "width": int(img.shape[1]),
                    "height": int(img.shape[0]),
                    "channels": int(img.shape[2]),
                    "mean_pixel": float(img.mean()),
                    "digest": hashlib.blake2b(img.tobytes(),
                                              digest_size=8).hexdigest(),
                })
            return pa.table({
                "media_id": t["media_id"], "kind": t["kind"],
                "features": pa.array(feats, type=REAL_FEATURES_TYPE),
            })
        payloads = t["payload"].to_pylist()
        feats = []
        for p in payloads:
            a = np.frombuffer(p, dtype=np.uint8)
            feats.append({
                "n_bytes": int(a.size),
                "mean_byte": float(a.mean()),
                "std_byte": float(a.std()),
                "digest": hashlib.blake2b(p, digest_size=8).hexdigest(),
            })
        return pa.table({
            "media_id": t["media_id"], "kind": t["kind"],
            "features": pa.array(feats, type=pa.struct([
                ("n_bytes", pa.int64()), ("mean_byte", pa.float64()),
                ("std_byte", pa.float64()), ("digest", pa.string())])),
        })


def media_features(n: int = 256, *, batch_size: int = 32,
                   concurrency=(1, 4)) -> Dataset:
    """synthesize -> actor-pool decode (fake) -> features table."""
    return synthesize_media(n).map_batches(
        ImageDecode, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def documents_as_media(sf_dir: str) -> Dataset:
    """Wrap the documents table as a media table: each doc's UTF-8 bytes
    become the opaque payload (the deterministic stand-in for a real binary
    source — same schema, batch-size and actor contract as real media)."""
    def wrap(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        kinds = [("image", "audio", "video")[i % 3] for i in ids]
        return pa.table({
            "media_id": pa.array([f"d{i}" for i in ids]),
            "kind": pa.array(kinds),
            "payload": pa.array([s.encode() for s in texts], type=pa.binary()),
            "meta": pa.array([{"width": 0, "height": 0,
                               "sample_rate": 16000 if k == "audio" else 0,
                               "n_frames": 1} for k in kinds],
                             type=MEDIA_SCHEMA.field("meta").type),
        }, schema=MEDIA_SCHEMA)

    from .io import read_table
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]
                      ).map_batches(wrap, batch_format="pyarrow", batch_size=64)


def document_media_features(sf_dir: str):
    """Driver query for the multimodal plumbing: payload -> actor-pool
    decode (deterministic fake) -> per-item features. The byte-statistics
    columns are SQL-expressible, so this surface is oracle-checked; the
    digest column is pinned by pytest instead."""
    ds = documents_as_media(sf_dir).map_batches(
        ImageDecode, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 4))

    def project(t: pa.Table) -> pa.Table:
        f = t["features"].combine_chunks()
        mean = np.asarray(f.field("mean_byte"))
        r = np.sign(mean) * np.floor(np.abs(mean) * 1e4 + 0.5) / 1e4
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "n_bytes": f.field("n_bytes"),
            "mean_byte": pa.array(r),
        })

    return ds.map_batches(project, batch_format="pyarrow").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)


class ImageResize:
    """Actor-pool resize stage: decode (PNG/PPM native) -> nearest-neighbor
    resample to (out_w, out_h) -> emit the raw RGB(A) array as fixed-layout
    bytes + dims. Nearest-neighbor is pure numpy indexing — no codec
    library needed, deterministic, and the real shape of a preprocessing
    stage feeding a training pipeline (uniform tensors out)."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {"media_id": [], "width": [], "height": [], "channels": [],
                "pixels": []}
        for mid, p in zip(t["media_id"].to_pylist(),
                          t["payload"].to_pylist()):
            img = decode_image_bytes(p)
            h, w, c = img.shape
            yi = np.minimum((np.arange(self.out_h) * h) // self.out_h, h - 1)
            xi = np.minimum((np.arange(self.out_w) * w) // self.out_w, w - 1)
            small = img[yi][:, xi]
            rows["media_id"].append(mid)
            rows["width"].append(self.out_w)
            rows["height"].append(self.out_h)
            rows["channels"].append(int(c))
            rows["pixels"].append(small.tobytes())
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "channels": pa.array(rows["channels"], pa.int32()),
            "pixels": pa.array(rows["pixels"], pa.binary()),
        })


class FrameSample:
    """Actor-pool frame sampler for video payloads: the payload is
    meta.n_frames equal-size frames back to back (the raw-frames contract
    a real decoder would feed this stage); emit every `stride`-th frame as
    its own row (media_id, frame_idx, frame). flat_map shape: one input
    row fans out to ceil(n_frames/stride) rows — batch sizes stay small
    upstream because payloads are large (module docstring)."""

    def __init__(self, stride: int = 8):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        meta = t["meta"].combine_chunks()
        nf = meta.field("n_frames").to_numpy(zero_copy_only=False)
        rows = {"media_id": [], "frame_idx": [], "frame": []}
        for mid, p, n in zip(t["media_id"].to_pylist(),
                             t["payload"].to_pylist(),
                             nf.astype(np.int64)):
            n = max(int(n), 1)
            fsize = len(p) // n
            if fsize == 0:
                continue
            for i in range(0, n, self.stride):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(i)
                rows["frame"].append(p[i * fsize:(i + 1) * fsize])
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.string()),
            "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
            "frame": pa.array(rows["frame"], pa.binary()),
        })


def decode_audio_bytes(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to (samples float64 in [-1, 1] x channels,
    sample_rate) — stdlib `wave` + numpy, no codec library. 8/16/32-bit
    PCM; anything else raises with the declared reason."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(b)) as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:
        raise NotImplementedError(
            f"audio decode: only PCM WAV is container-decodable ({e}); "
            "compressed codecs need external libraries") from e
    if width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128) / 128
    elif width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768
    elif width == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648
    else:
        raise NotImplementedError(f"audio decode: {width * 8}-bit PCM "
                                  "unsupported")
    return x.reshape(-1, nch), rate


AUDIO_FEATURES_TYPE = pa.struct([
    ("n_samples", pa.int64()), ("sample_rate", pa.int32()),
    ("channels", pa.int32()), ("duration_sec", pa.float64()),
    ("rms", pa.float64()), ("peak", pa.float64())])


class AudioDecode:
    """Actor-pool audio decode stage: REAL for PCM WAV (stdlib wave), per
    -clip duration / RMS / peak features; non-audio kinds and compressed
    codecs raise with a declared reason."""

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for mid, kind, p in zip(t["media_id"].to_pylist(),
                                t["kind"].to_pylist(),
                                t["payload"].to_pylist()):
            if kind != "audio":
                raise NotImplementedError(
                    f"AudioDecode got kind={kind!r} (media_id={mid}); "
                    "filter to kind == 'audio' upstream")
            x, rate = decode_audio_bytes(p)
            n = x.shape[0]
            feats.append({
                "n_samples": int(n),
                "sample_rate": int(rate),
                "channels": int(x.shape[1]),
                "duration_sec": n / rate if rate else 0.0,
                "rms": float(np.sqrt((x ** 2).mean())) if n else 0.0,
                "peak": float(np.abs(x).max()) if n else 0.0,
            })
        return pa.table({
            "media_id": t["media_id"],
            "features": pa.array(feats, type=AUDIO_FEATURES_TYPE),
        })
