"""Pure-stdlib media codecs — REAL decode kernels for the multimodal
pipeline (no image/audio libraries exist in this environment, but PNG is
just zlib + per-row filters, BMP and WAV are plain structs, and JPEG/GIF
sizes are header scans — all decodable with bytes + numpy).

Supported:
  * PNG: full pixel decode for 8-bit gray/RGB/RGBA, filters 0-4
    (None/Sub/Up/Average/Paeth), non-interlaced; CRC-checked encode for
    fixtures.
  * BMP: 24-bit uncompressed bottom-up pixel decode + encode.
  * WAV: PCM16 mono/stereo decode to float32 mono + encode.
  * JPEG/GIF: header-only size parse (full entropy decode genuinely needs
    a codec library and stays out of scope).

Feature kernels (deterministic, frozen):
  * image_feature: [mean RGB, luminance std, 8-bin luminance histogram,
    aspect ratio, log area] padded/truncated to ``dim``.
  * audio_feature: [RMS, peak, zero-crossing rate, 8 log-spaced rfft band
    energies] padded/truncated to ``dim``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ----------------------------------------------------------------- PNG


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit gray (h,w), RGB (h,w,3) or RGBA (h,w,4) -> minimal valid PNG
    (filter 0 rows, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, nch = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        color_type, nch = 2, 3
    elif arr.shape[2] == 4:
        color_type, nch = 6, 4
    else:
        raise ValueError("unsupported channel count")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit gray/RGB/RGBA, filters 0-4, no
    interlace.  Returns (h, w) or (h, w, c) uint8."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = None
    idat = b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
            if bit_depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG (need 8-bit, non-interlaced)")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    nch = {0: 1, 2: 3, 6: 4}.get(color_type)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * nch + 1
    if raw.size != h * stride:
        raise ValueError("PNG data size mismatch")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * nch), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(w * nch, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up (vectorized)
            out[y] = cur + prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth: left-dependent per pixel
            line = np.zeros(w * nch, dtype=np.uint8)
            for x in range(w * nch):
                a = line[x - nch] if x >= nch else np.uint8(0)
                if f == 1:
                    line[x] = cur[x] + a
                elif f == 3:
                    line[x] = cur[x] + np.uint8((int(a) + int(prev[x])) // 2)
                else:
                    c = prev[x - nch] if x >= nch else np.uint8(0)
                    line[x] = cur[x] + _paeth(
                        np.array(a), np.array(prev[x]), np.array(c)
                    )
            out[y] = line
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.reshape(h, w, nch)
    return img[:, :, 0] if nch == 1 else img


# ----------------------------------------------------------------- BMP


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up, BGR)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    row_pad = (-(w * 3)) % 4
    body = b"".join(
        arr[y, :, ::-1].tobytes() + b"\x00" * row_pad for y in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP (need 24-bit uncompressed)")
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3 + ((-(w * 3)) % 4)
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return rows[::-1] if flip else rows


# ----------------------------------------------------------------- size-only


def parse_image_size(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the header alone — PNG/BMP/GIF/JPEG."""
    if data.startswith(_PNG_SIG) and len(data) >= 24:
        w, h = struct.unpack_from(">II", data, 16)
        return "png", w, h
    if data[:2] == b"BM" and len(data) >= 26:
        _, w, h = struct.unpack_from("<Iii", data, 14)
        return "bmp", w, abs(h)
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack_from("<HH", data, 6)
        return "gif", w, h
    if data[:2] == b"\xff\xd8":  # JPEG: scan for a SOF marker
        pos = 2
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return "jpeg", w, h
            (seg_len,) = struct.unpack_from(">H", data, pos + 2)
            pos += 2 + seg_len
        return None
    return None


# ----------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32/float64 [-1, 1] mono samples -> PCM16 WAV."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1, 1)
    pcm = (pcm * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM16 WAV -> (sample_rate, float32 mono samples in [-1, 1])."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV (need PCM16)")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data")
    if channels and channels > 1:
        samples = samples[: samples.size - samples.size % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return rate, samples


# ------------------------------------------------------------- features


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index gather — deterministic
    integer sample grid: src = floor((dst + 0.5) * in/out), the standard
    pixel-center mapping)."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError("resize target must be positive")
    h, w = img.shape[:2]
    ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[ri][:, ci]


_KFV_MAGIC = b"KFV1"


def encode_kfv(frames: list[bytes]) -> bytes:
    """Encode a frame-blob container (magic + u32 count + per-frame u32
    length-prefixed blobs) — the TEST container standing in for real
    video (mp4/h264 need codec libraries this environment doesn't have);
    the Ray-side plumbing (schema, sampling, batch sizing) is real."""
    out = [_KFV_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_kfv(data: bytes) -> list[bytes]:
    """Decode the KFV1 frame container; raises ValueError on anything
    else (the honest codec-library boundary)."""
    if len(data) < 8 or data[:4] != _KFV_MAGIC:
        raise ValueError("not a KFV1 container")
    n = struct.unpack_from("<I", data, 4)[0]
    off, frames = 8, []
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated KFV1 container")
        ln = struct.unpack_from("<I", data, off)[0]
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated KFV1 frame")
        frames.append(data[off : off + ln])
        off += ln
    return frames


def _fit(vec: np.ndarray, dim: int) -> np.ndarray:
    out = np.zeros(dim, dtype=np.float32)
    n = min(dim, vec.size)
    out[:n] = vec[:n]
    return out


def image_feature(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Frozen image descriptor: mean RGB, luminance std, 8-bin luminance
    histogram (density), aspect, log10 area."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    f = img[:, :, :3].astype(np.float64)
    lum = f @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=8, range=(0, 256))[0] / max(1, lum.size)
    h, w = img.shape[:2]
    vec = np.concatenate(
        [
            f.reshape(-1, 3).mean(axis=0) / 255.0,
            [lum.std() / 255.0],
            hist,
            [w / max(1, h), np.log10(max(1, h * w))],
        ]
    )
    return _fit(vec, dim)


def audio_feature(rate: int, samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """Frozen audio descriptor: RMS, peak, zero-crossing rate, 8
    log-spaced rfft band energies (L2-normalized)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.abs(x).max())
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x))
    edges = np.unique(np.geomspace(1, spec.size, 9).astype(np.int64))
    bands = np.add.reduceat(spec, edges[:-1]) if spec.size > 1 else np.zeros(8)
    bands = bands / max(1e-12, np.linalg.norm(bands))
    vec = np.concatenate([[rms, peak, zcr], _fit(bands, 8)])
    return _fit(vec, dim)
