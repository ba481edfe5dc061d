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


class MediaResizeStage:
    """Actor-pool image-resize stage: decode (PNG/BMP) -> nearest-
    neighbor resize -> re-encode PNG.  Undecodable payloads pass through
    with decoded=False (the honest codec-library boundary); batch_size
    stays small because payload MBs x batch x concurrency must fit the
    worker heap (the wide-binary rule)."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h, self.out_w = int(out_h), int(out_w)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_payload, widths, heights, decoded = [], [], [], []
        for kind, payload in zip(batch["kind"], batch["payload"]):
            payload = payload or b""
            img = None
            if kind == "image":
                try:
                    size = mc.parse_image_size(payload)
                    if size is not None and size[0] == "png":
                        img = mc.decode_png(payload)
                    elif size is not None and size[0] == "bmp":
                        img = mc.decode_bmp(payload)
                except ValueError:
                    img = None
            if img is None:
                out_payload.append(payload)
                widths.append(None)
                heights.append(None)
                decoded.append(False)
            else:
                small = mc.resize_nearest(img, self.out_h, self.out_w)
                out_payload.append(mc.encode_png(small))
                widths.append(self.out_w)
                heights.append(self.out_h)
                decoded.append(True)
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype(np.int64),
                "kind": batch["kind"],
                "payload": pd.Series(out_payload, dtype=object),
                "width": pd.Series(widths, dtype="Int64"),
                "height": pd.Series(heights, dtype="Int64"),
                "decoded": pd.Series(decoded, dtype=bool),
            }
        )


def media_resize(media_ds, out_h: int = 16, out_w: int = 16, batch_size: int = 64, concurrency: int = 2):
    """Resize every decodable image to (out_h, out_w), re-encoded PNG."""
    return media_ds.map_batches(
        MediaResizeStage,
        fn_constructor_args=(out_h, out_w),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Actor-pool video frame sampler: decode the KFV1 frame container
    (the test stand-in for mp4/h264 — see mediacodec.encode_kfv) and
    emit every ``every``-th frame as its own row (media_id, frame_idx,
    payload).  One input row fans out to ceil(n_frames/every) rows —
    flat-map shape, wide-binary batch sizing."""

    def __init__(self, every: int = 2):
        self.every = max(1, int(every))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mids, idxs, payloads, ws, hs = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].astype(np.int64), batch["payload"]):
            try:
                frames = mc.decode_kfv(payload or b"")
            except ValueError:
                continue  # not a KFV container: nothing to sample
            for fi in range(0, len(frames), self.every):
                f = frames[fi]
                size = mc.parse_image_size(f)
                mids.append(mid)
                idxs.append(fi)
                payloads.append(f)
                ws.append(size[1] if size else None)
                hs.append(size[2] if size else None)
        return pd.DataFrame(
            {
                "media_id": pd.Series(mids, dtype=np.int64),
                "frame_idx": pd.Series(idxs, dtype=np.int64),
                "payload": pd.Series(payloads, dtype=object),
                "width": pd.Series(ws, dtype="Int64"),
                "height": pd.Series(hs, dtype="Int64"),
            }
        )


def frame_sample(video_ds, every: int = 2, batch_size: int = 16, concurrency: int = 2):
    """Sample every ``every``-th frame from KFV video payloads."""
    return video_ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(every,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_video_fixture(n: int = 16, seed: int = 99) -> pd.DataFrame:
    """Deterministic KFV 'video' table: each payload holds 4-12 PNG
    frames of one random size."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        frames = [
            mc.encode_png(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            for _ in range(int(rng.integers(4, 13)))
        ]
        rows.append(mc.encode_kfv(frames))
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": "video",
            "payload": pd.Series(rows, dtype=object),
            "meta": json.dumps({"container": "kfv1"}),
        }
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
