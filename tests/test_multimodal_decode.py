"""Real image decode for container-decodable formats (ops/multimodal.py):
PNG (stdlib zlib + RFC 2083 filters) and binary PPM/PGM, plus the
actor-pool plumbing running the real decode end-to-end."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from stats_ray.ops.multimodal import (MEDIA_SCHEMA, ImageDecode,
                                      decode_image_bytes)

_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """Minimal PNG writer for tests: per-row filter types from `filters`
    (default all 0), forward-filtering exactly per RFC 2083."""
    h, w, c = img.shape
    filters = filters or [0] * h
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR[c], 0, 0, 0)
    img32 = img.astype(np.int32)
    rows = []
    for y, f in enumerate(filters):
        cur = img32[y].reshape(-1)
        prev = img32[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        out = np.empty(w * c, np.int32)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else cc)
            out[x] = (cur[x] - pred) & 255
        rows.append(bytes([f]) + out.astype(np.uint8).tobytes())
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))


def _rand_img(h, w, c, seed):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, c)).astype(np.uint8)


def test_png_roundtrip_all_color_types():
    for c in (1, 2, 3, 4):
        img = _rand_img(7, 5, c, seed=c)
        got = decode_image_bytes(encode_png(img))
        assert got.shape == img.shape
        assert (got == img).all(), f"channels={c}"


def test_png_roundtrip_every_filter_type():
    img = _rand_img(10, 6, 3, seed=42)
    for f in range(5):
        got = decode_image_bytes(encode_png(img, filters=[f] * 10))
        assert (got == img).all(), f"filter={f}"
    # mixed filters per row
    got = decode_image_bytes(encode_png(img, filters=[0, 1, 2, 3, 4,
                                                      4, 3, 2, 1, 0]))
    assert (got == img).all()


def test_ppm_and_pgm_decode():
    img = _rand_img(4, 6, 3, seed=9)
    ppm = b"P6\n# a comment\n6 4\n255\n" + img.tobytes()
    assert (decode_image_bytes(ppm) == img).all()
    gray = _rand_img(3, 5, 1, seed=10)
    pgm = b"P5 5 3 255\n" + gray.tobytes()
    assert (decode_image_bytes(pgm) == gray).all()


def test_undecodable_formats_raise_declared_reason():
    with pytest.raises(NotImplementedError):
        decode_image_bytes(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    # 16-bit PNG declared unsupported
    img = _rand_img(2, 2, 3, seed=1)
    bad = bytearray(encode_png(img))
    bad[24] = 16                                    # IHDR bit depth
    with pytest.raises(NotImplementedError):
        decode_image_bytes(bytes(bad))


def test_real_decode_stage_over_actor_pool(ray_session):
    """The fake=False path is REAL for PNG payloads: schema, actor
    signature and features all exercised through Ray."""
    import ray.data

    imgs = [_rand_img(8, 8, 3, seed=i) for i in range(12)]
    t = pa.table({
        "media_id": pa.array([f"m{i:03d}" for i in range(12)]),
        "kind": pa.array(["image"] * 12),
        "payload": pa.array([encode_png(im) for im in imgs],
                            type=pa.binary()),
        "meta": pa.array([{"width": 8, "height": 8, "sample_rate": 0,
                           "n_frames": 1}] * 12,
                         type=MEDIA_SCHEMA.field("meta").type),
    }, schema=MEDIA_SCHEMA)
    out = (ray.data.from_arrow(t)
           .map_batches(ImageDecode, fn_constructor_kwargs={"fake": False},
                        batch_format="pyarrow", batch_size=4,
                        concurrency=(1, 2))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert len(out) == 12
    for i, feat in enumerate(out["features"]):
        assert feat["width"] == 8 and feat["height"] == 8
        assert feat["channels"] == 3
        assert feat["mean_pixel"] == pytest.approx(float(imgs[i].mean()))

    # non-image kinds still refuse (no codec libs for audio/video)
    t2 = pa.table({"media_id": ["a"], "kind": ["audio"],
                   "payload": [b"RIFF...."],
                   "meta": pa.array([{"width": 0, "height": 0,
                                      "sample_rate": 16000, "n_frames": 1}],
                                    type=MEDIA_SCHEMA.field("meta").type)},
                  schema=MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        ImageDecode(fake=False)(t2)


def test_image_resize_stage(ray_session):
    """Nearest-neighbor resize over the actor pool: uniform output tensors
    from mixed-size PNG inputs, exact corner-pixel semantics."""
    import ray.data

    from stats_ray.ops.multimodal import MEDIA_SCHEMA, ImageResize

    imgs = [_rand_img(5, 9, 3, seed=50), _rand_img(17, 4, 3, seed=51)]
    t = pa.table({
        "media_id": pa.array(["a", "b"]),
        "kind": pa.array(["image"] * 2),
        "payload": pa.array([encode_png(im) for im in imgs],
                            type=pa.binary()),
        "meta": pa.array([{"width": 0, "height": 0, "sample_rate": 0,
                           "n_frames": 1}] * 2,
                         type=MEDIA_SCHEMA.field("meta").type),
    }, schema=MEDIA_SCHEMA)
    out = (ray.data.from_arrow(t)
           .map_batches(ImageResize,
                        fn_constructor_kwargs={"out_w": 4, "out_h": 4},
                        batch_format="pyarrow", concurrency=(1, 2))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert list(out["width"]) == [4, 4] and list(out["height"]) == [4, 4]
    for row, img in zip(out.itertuples(), imgs):
        small = np.frombuffer(row.pixels, np.uint8).reshape(4, 4, 3)
        # nearest-neighbor: output (0,0) is input (0,0)
        assert (small[0, 0] == img[0, 0]).all()


def test_frame_sample_stage():
    from stats_ray.ops.multimodal import MEDIA_SCHEMA, FrameSample

    n_frames, fsize = 24, 10
    payload = bytes(bytearray(range(240)))    # frame i = bytes 10i..10i+9
    t = pa.table({
        "media_id": pa.array(["v"]),
        "kind": pa.array(["video"]),
        "payload": pa.array([payload], type=pa.binary()),
        "meta": pa.array([{"width": 0, "height": 0, "sample_rate": 0,
                           "n_frames": n_frames}],
                         type=MEDIA_SCHEMA.field("meta").type),
    }, schema=MEDIA_SCHEMA)
    out = FrameSample(stride=8)(t)
    assert out["frame_idx"].to_pylist() == [0, 8, 16]
    for idx, fr in zip(out["frame_idx"].to_pylist(),
                       out["frame"].to_pylist()):
        assert fr == payload[idx * fsize:(idx + 1) * fsize]


def _encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """samples: (n, ch) float in [-1, 1] -> PCM16 WAV bytes (stdlib)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767)
                      .astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_decode_wav_roundtrip(ray_session):
    import ray.data

    from stats_ray.ops.multimodal import (MEDIA_SCHEMA, AudioDecode,
                                          decode_audio_bytes)

    t_axis = np.arange(1600) / 16000.0
    sine = np.sin(2 * np.pi * 440 * t_axis)[:, None]    # 0.1 s mono A4
    wav = _encode_wav(sine)
    x, rate = decode_audio_bytes(wav)
    assert rate == 16000 and x.shape == (1600, 1)
    # PCM16 quantization keeps the waveform within 1 LSB
    assert np.abs(x[:, 0] - sine[:, 0]).max() < 2 / 32767

    t = pa.table({
        "media_id": pa.array(["a1", "a2"]),
        "kind": pa.array(["audio"] * 2),
        "payload": pa.array([wav, _encode_wav(np.zeros((800, 2)))],
                            type=pa.binary()),
        "meta": pa.array([{"width": 0, "height": 0, "sample_rate": 16000,
                           "n_frames": 1}] * 2,
                         type=MEDIA_SCHEMA.field("meta").type),
    }, schema=MEDIA_SCHEMA)
    out = (ray.data.from_arrow(t)
           .map_batches(AudioDecode, batch_format="pyarrow",
                        concurrency=(1, 2))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    f1, f2 = out["features"]
    assert f1["duration_sec"] == pytest.approx(0.1)
    assert f1["rms"] == pytest.approx(1 / np.sqrt(2), abs=1e-3)  # sine RMS
    assert f2["channels"] == 2 and f2["rms"] == 0.0

    # compressed / non-WAV audio raises with the declared reason
    with pytest.raises(NotImplementedError):
        decode_audio_bytes(b"ID3\x04fake mp3 bytes")
