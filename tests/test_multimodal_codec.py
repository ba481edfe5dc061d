"""Pure-stdlib media codecs: PNG/BMP pixel round-trips, WAV PCM
round-trip, header size parses, and the feature stage's real-decode
flags."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.functions import mediacodec as mc


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(3)
    for shape in [(5, 7), (9, 4, 3), (6, 6, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)
    # a PNG with non-zero filters (encoded by another writer) must decode:
    # build one manually with Sub/Up/Average/Paeth rows
    import struct
    import zlib

    w, h = 4, 4
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raws = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y, f in enumerate([1, 2, 3, 4]):
        cur = img[y].reshape(-1)
        raws.append(bytes([f]))
        # encode row: filt(x) = cur(x) - pred(x)
        line = np.zeros(w * 3, dtype=np.uint8)
        for x in range(w * 3):
            a = int(cur[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) % 256
        raws[-1] += line.tobytes()
        prev = cur
    raw = b"".join(raws)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(png), img)


def test_bmp_roundtrip_and_size():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    data = mc.encode_bmp(img)
    assert np.array_equal(mc.decode_bmp(data), img)
    assert mc.parse_image_size(data) == ("bmp", 7, 5)
    assert mc.parse_image_size(mc.encode_png(img)) == ("png", 7, 5)


def test_gif_and_jpeg_header_sizes():
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert mc.parse_image_size(gif) == ("gif", 320, 200)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"       # APP0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 240, 480) + b"\x03" + b"\x00" * 3
    )
    assert mc.parse_image_size(jpeg) == ("jpeg", 480, 240)


def test_wav_roundtrip():
    t = np.arange(2000) / 8000.0
    x = 0.25 * np.sin(2 * np.pi * 440 * t)
    rate, y = mc.decode_wav(mc.encode_wav(x, 8000))
    assert rate == 8000
    assert y.size == x.size
    assert np.abs(y - x).max() < 1e-3  # PCM16 quantization only


def test_media_stage_real_decode(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.multimodal import make_media_fixture, media_features

    fix = make_media_fixture(40)
    out = media_features(rd.from_pandas(fix)).to_pandas().sort_values("media_id")
    img = out[out["kind"] == "image"]
    aud = out[out["kind"] == "audio"]
    vid = out[out["kind"] == "video"]
    assert img["decoded"].all()            # PNG + BMP really decode
    assert aud["decoded"].all()            # WAV really decodes
    assert not vid["decoded"].any()        # no stdlib video codec -> stand-in
    assert (aud["duration_s"] > 0).all()
    assert img["width"].notna().all() and (img["width"] > 0).all()
    # features deterministic across runs
    out2 = media_features(rd.from_pandas(fix)).to_pandas().sort_values("media_id")
    for a, b in zip(out["feature"], out2["feature"]):
        assert np.array_equal(a, b)
