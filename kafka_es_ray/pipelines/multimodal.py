"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — see ``DecodeError`` / the deterministic fake), but the
Ray-side plumbing is real and tested: schema contract, actor-pool stage
shape, small batch sizes for wide binary rows (SURVEY §7.4 wide-binary
rule: large payloads never enter a shuffle; metadata-only columns flow
on).

Schema contract for a media table:
    media_id: int64, kind: string (image|audio|video),
    payload: binary, meta: string (JSON: {width,height,...})
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd


class DecodeError(NotImplementedError):
    pass


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': seeds a PRNG from the payload's CRC —
    a stand-in with the exact signature/shape a real decode would have."""
    rng = np.random.default_rng(zlib.crc32(payload or b""))
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureStage:
    """Actor-pool decode/feature-extract stage.

    Real deployments load the model/codec once here in __init__ (the
    once-per-worker rule, reference ProtobufSerde.kt:26-73) and replace
    ``_fake_feature`` with the real kernel.  ``strict=True`` raises
    DecodeError to mark the stub boundary explicitly."""

    def __init__(self, dim: int = 16, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise DecodeError(
                "media decode requires image/audio libraries not present in "
                "this environment; wire a real kernel here"
            )
        feats = [_fake_feature(p, self.dim) for p in batch["payload"]]
        metas = batch["meta"].map(lambda m: json.loads(m) if m else {})
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype(np.int64),
                "kind": batch["kind"],
                "width": pd.Series([m.get("width") for m in metas], dtype="Int64"),
                "height": pd.Series([m.get("height") for m in metas], dtype="Int64"),
                "feature": pd.Series(feats, dtype=object),
                "payload_bytes": pd.Series([len(p or b"") for p in batch["payload"]], dtype=np.int64),
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
    """Deterministic media table fixture (binary payloads + JSON meta)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(np.array(["image", "audio", "video"], dtype=object), n, p=[0.6, 0.3, 0.1])
    payloads = [rng.bytes(int(rng.integers(100, 5000))) for _ in range(n)]
    metas = [
        json.dumps({"width": int(rng.integers(16, 1920)), "height": int(rng.integers(16, 1080))})
        for _ in range(n)
    ]
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": pd.Series(payloads, dtype=object),
            "meta": metas,
        }
    )
