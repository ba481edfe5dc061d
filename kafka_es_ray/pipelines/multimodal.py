"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, decoded by REAL pure-stdlib kernels where the format
allows (functions/mediacodec: PNG/BMP full pixel decode, WAV PCM decode,
GIF/JPEG header size parse — no external media libraries needed).

Formats whose entropy decode genuinely requires a codec library
(JPEG/GIF pixels, video) fall back to a clearly-marked deterministic
stand-in feature and are flagged ``decoded=False``.

Ray-side shape: actor-pool ``map_batches`` with SMALL batches for wide
binary rows (SURVEY §7.4 wide-binary rule: large payloads never enter a
shuffle; metadata/feature columns flow on).

Schema contract for a media table:
    media_id: int64, kind: string (image|audio|video),
    payload: binary, meta: string (JSON)
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd

from kafka_es_ray.functions import mediacodec as mc


class DecodeError(NotImplementedError):
    pass


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for formats needing external codecs: seeds
    a PRNG from the payload's CRC (same signature/shape as the real
    kernels)."""
    rng = np.random.default_rng(zlib.crc32(payload or b""))
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureStage:
    """Actor-pool decode/feature-extract stage (codec state built once
    per worker — the once-per-worker rule, reference
    ProtobufSerde.kt:26-73)."""

    def __init__(self, dim: int = 16, strict: bool = False):
        self.dim = dim
        # strict=True raises instead of falling back for undecodable
        # payloads — marks the codec-library boundary explicitly
        self.strict = strict

    def _one(self, kind: str, payload: bytes) -> dict:
        payload = payload or b""
        out = {
            "format": None,
            "width": None,
            "height": None,
            "duration_s": None,
            "decoded": False,
            "feature": None,
        }
        try:
            if kind == "image":
                size = mc.parse_image_size(payload)
                if size is not None:
                    out["format"], out["width"], out["height"] = size
                if out["format"] == "png":
                    img = mc.decode_png(payload)
                    out["feature"] = mc.image_feature(img, self.dim)
                    out["decoded"] = True
                elif out["format"] == "bmp":
                    img = mc.decode_bmp(payload)
                    out["feature"] = mc.image_feature(img, self.dim)
                    out["decoded"] = True
            elif kind == "audio":
                rate, samples = mc.decode_wav(payload)
                out["format"] = "wav"
                out["duration_s"] = round(samples.size / rate, 6)
                out["feature"] = mc.audio_feature(rate, samples, self.dim)
                out["decoded"] = True
        except ValueError:
            pass  # undecodable -> fall through to the stand-in
        if not out["decoded"]:
            if self.strict:
                raise DecodeError(
                    f"no pure-stdlib decoder for this {kind} payload "
                    "(JPEG/GIF pixels and video need a codec library)"
                )
            out["feature"] = _fake_feature(payload, self.dim)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        metas = batch["meta"].map(lambda m: json.loads(m) if m else {})
        rows = [self._one(k, p) for k, p in zip(batch["kind"], batch["payload"])]
        width = [
            r["width"] if r["width"] is not None else m.get("width")
            for r, m in zip(rows, metas)
        ]
        height = [
            r["height"] if r["height"] is not None else m.get("height")
            for r, m in zip(rows, metas)
        ]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype(np.int64),
                "kind": batch["kind"],
                "format": pd.Series([r["format"] for r in rows], dtype=object),
                "width": pd.Series(width, dtype="Int64"),
                "height": pd.Series(height, dtype="Int64"),
                "duration_s": pd.Series([r["duration_s"] for r in rows], dtype="Float64"),
                "decoded": pd.Series([r["decoded"] for r in rows], dtype=bool),
                "feature": pd.Series([r["feature"] for r in rows], dtype=object),
                "payload_bytes": pd.Series(
                    [len(p or b"") for p in batch["payload"]], dtype=np.int64
                ),
            }
        )


def media_features(media_ds, dim: int = 16, batch_size: int = 64, concurrency: int = 2):
    """Feature extraction over a media table.  batch_size is SMALL by
    design: payload MBs x batch x concurrency must fit the worker heap."""
    return media_ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_media_fixture(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic media table with REAL payloads: PNG + BMP images,
    PCM16 WAV audio, plus GIF header-only and opaque 'video' bytes."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        pick = i % 5
        if pick in (0, 1):  # PNG (gray or RGB)
            w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            if pick == 0:
                img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            else:
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append(("image", mc.encode_png(img), {"width": w, "height": h}))
        elif pick == 2:  # BMP
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append(("image", mc.encode_bmp(img), {"width": w, "height": h}))
        elif pick == 3:  # WAV
            dur = int(rng.integers(400, 4000))
            t = np.arange(dur) / 8000.0
            f0 = float(rng.uniform(100, 1000))
            rows.append(
                ("audio", mc.encode_wav(0.5 * np.sin(2 * np.pi * f0 * t), 8000), {})
            )
        else:  # opaque 'video' payload (no stdlib decoder exists)
            rows.append(("video", rng.bytes(int(rng.integers(100, 5000))), {}))
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": [r[0] for r in rows],
            "payload": pd.Series([r[1] for r in rows], dtype=object),
            "meta": [json.dumps(r[2]) for r in rows],
        }
    )
