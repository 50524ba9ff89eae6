"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a typed
metadata struct, processed by actor-pool ``map_batches`` stages.  The
pixel/sample DECODERS ARE STUBBED (no image/audio libraries exist in
this container): ``FakeCodec`` produces a deterministic payload-derived
"decode" so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end; swapping in
Pillow/torchaudio is a one-class change (``Codec`` protocol below).

Scale notes (the reason this is its own stage family):
- binary payloads are LARGE; the stages run with explicit small
  ``batch_size`` and ``batch_format="pyarrow"`` (binary columns do not
  round-trip pandas), so batch x concurrency fits worker heaps;
- decoded features drop the payload immediately (project-early, like
  the reference dropping raw bracket text after parse,
  ``/root/reference/OneSTools.EventLog/LgpReader.cs:92-98``).
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio" | "video"
    ("payload", pa.large_binary()),
    ("source_path", pa.string()),
])

FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("n_bytes", pa.int64()),
    ("width", pa.int64()),           # image/video: decoded dims; audio: -1
    ("height", pa.int64()),
    ("n_frames", pa.int64()),        # video frame count / audio chunk count
    ("feature", pa.list_(pa.float32(), 8)),   # fixed-size feature vector
])


class Codec(Protocol):
    """Decoder contract a real implementation (Pillow/ffmpeg/torchaudio)
    must satisfy; one instance per actor, constructed in ``__init__``."""

    def decode(self, payload: bytes, kind: str) -> dict: ...


class FakeCodec:
    """Deterministic stand-in decoder: dims / frame counts / features are
    derived from md5 of the payload's lowercase hex, so they are exactly
    reproducible by the DuckDB oracle (``md5_number_upper/lower``) — the
    multimodal lane's correctness signal.  The uint32 lanes below are the
    little-endian digest words, matching DuckDB's md5_number semantics.
    """

    def decode(self, payload: bytes, kind: str) -> dict:
        ph = payload.hex()                       # lowercase hex, like SQL hex
        h = hashlib.md5(ph.encode()).digest()
        rng = np.frombuffer(h, dtype="<u4")      # 4 LE uint32 words
        f0 = np.frombuffer(hashlib.md5((ph + ":feat0").encode()).digest(),
                           dtype="<u4")
        f1 = np.frombuffer(hashlib.md5((ph + ":feat1").encode()).digest(),
                           dtype="<u4")
        feature = (np.concatenate([f0, f1]).astype(np.float64)
                   / 2**32).astype(np.float32)
        if kind == "image":
            return {"width": 16 + int(rng[0] % 4096),
                    "height": 16 + int(rng[1] % 4096),
                    "n_frames": 1, "feature": feature}
        if kind == "video":
            return {"width": 16 + int(rng[0] % 1920),
                    "height": 16 + int(rng[1] % 1080),
                    "n_frames": 1 + int(rng[2] % 3000), "feature": feature}
        return {"width": -1, "height": -1,
                "n_frames": 1 + int(rng[2] % 10_000), "feature": feature}


class MediaFeatureExtractor:
    """Actor-pool stage: binary batch in, feature batch out (payload
    dropped).  ``codec_factory`` is called ONCE per actor in __init__ —
    this is where a real model/decoder load belongs (ST1 pattern)."""

    def __init__(self, codec_factory=FakeCodec):
        self.codec = codec_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        cols = {"media_id": [], "kind": [], "n_bytes": [], "width": [],
                "height": [], "n_frames": [], "feature": []}
        for mid, kind, payload in zip(ids, kinds, payloads):
            d = self.codec.decode(payload, kind)
            cols["media_id"].append(mid)
            cols["kind"].append(kind)
            cols["n_bytes"].append(len(payload))
            cols["width"].append(d["width"])
            cols["height"].append(d["height"])
            cols["n_frames"].append(d["n_frames"])
            cols["feature"].append(d["feature"])
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.int64()),
            "kind": pa.array(cols["kind"], pa.string()),
            "n_bytes": pa.array(cols["n_bytes"], pa.int64()),
            "width": pa.array(cols["width"], pa.int64()),
            "height": pa.array(cols["height"], pa.int64()),
            "n_frames": pa.array(cols["n_frames"], pa.int64()),
            "feature": pa.array([np.asarray(f, dtype=np.float32)
                                 for f in cols["feature"]],
                                pa.list_(pa.float32(), 8)),
        })


def extract_media_features(ds: ray.data.Dataset, batch_size: int = 64,
                           concurrency=(1, 4),
                           codec_factory=FakeCodec) -> ray.data.Dataset:
    """The media pipeline: small batches (payloads are large), actor pool,
    payload dropped at the output boundary."""
    return ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(codec_factory=codec_factory))


def synthesize_media_table(n: int, seed: int = 42,
                           payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/queries: payload = md5
    keystream ``md5(f"{seed}:{i}:{j}")`` — reproducible by the oracle's
    ``string_agg(md5(...), '' ORDER BY j)`` (concatenated hex digests)."""
    kinds = ["image", "audio", "video"]
    ids, ks, payloads, paths = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        stream = b"".join(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            for j in range((payload_bytes + 15) // 16))
        ids.append(i)
        ks.append(kind)
        payloads.append(stream[:payload_bytes])
        paths.append(f"media/{kind}/{i:06d}.bin")
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(ks, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "source_path": pa.array(paths, pa.string()),
    })


class FrameSampler:
    """Actor-pool stage: video FRAME SAMPLING plumbing — every
    ``stride``-th fixed-size frame window of the payload, fingerprinted.
    A real decoder (ffmpeg keyframe extraction) slots into ``__init__``
    exactly like :class:`MediaFeatureExtractor`'s codec; the stub
    fingerprints each frame's lowercase hex with md5 so the DuckDB
    oracle (``substr(hex, k*2*frame_bytes+1, ...)``) reproduces every
    output row.  Non-video rows are dropped; payloads never leave the
    stage.  -> (media_id, frame_idx, frame_sig)."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, sigs = [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind != "video":
                continue
            n_frames = len(payload) // self.frame_bytes
            for k in range(0, n_frames, self.stride):
                frame_hex = payload[k * self.frame_bytes:
                                    (k + 1) * self.frame_bytes].hex()
                dig = hashlib.md5(frame_hex.encode()).digest()
                ids.append(mid)
                idxs.append(k)
                sigs.append(int.from_bytes(dig[8:16], "little") >> 1)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_sig": pa.array(sigs, pa.int64()),
        })


def sample_media_frames(ds: ray.data.Dataset, frame_bytes: int = 256,
                        stride: int = 4, batch_size: int = 16,
                        concurrency=(1, 4)) -> ray.data.Dataset:
    """Frame-sample every video payload — small batches (payloads are
    large), actor pool, only (id, idx, sig) rows leave the stage."""
    return ds.map_batches(FrameSampler, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              frame_bytes=frame_bytes, stride=stride))
