"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a typed
metadata struct, processed by actor-pool ``map_batches`` stages.  Two
decoders ship behind the ``Codec`` protocol:

- :class:`StructCodec` — a REAL pure-Python decoder (uncompressed
  24-bit BMP images, 16-bit PCM WAV audio, animated-GIF video with
  full LZW decompression: header parse + pixel/sample/frame decode),
  proving the seam with actual binary formats across all three kinds;
- :class:`FakeCodec` — a deterministic payload-derived stand-in for
  formats that need external libraries (JPEG/MP4/...; none exist in
  this container), exactly reproducible by the DuckDB oracle.

Swapping in Pillow/ffmpeg/torchaudio is a one-class change.

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


class StructCodec:
    """REAL pure-Python decoder proving the :class:`Codec` seam with
    actual binary formats (no external libs needed): uncompressed
    24-bit BMP for ``kind='image'``, 16-bit PCM WAV for
    ``kind='audio'`` and animated GIF (full LZW decompression,
    global/local palettes) for ``kind='video'`` — full container parse
    + pixel/sample decode into the same FEATURE_SCHEMA the stub emits.
    Feature vector (8 x float32):

        image: [mean_B, mean_G, mean_R, std_all, min_all, max_all,
                width/4096, height/4096]           (channel means /255)
        audio: [mean, rms, min, max, std, zero-cross rate,
                n_samples/1e6, sample_rate/1e5]     (amplitudes /32768)
        video: [mean_R, mean_G, mean_B, std_all, min_all, max_all,
                width/4096, height/4096]  over all frames' own rects
    """

    def decode(self, payload: bytes, kind: str) -> dict:
        if kind == "image":
            return self._decode_bmp(payload)
        if kind == "audio":
            return self._decode_wav(payload)
        if kind == "video":
            return self._decode_gif(payload)
        raise NotImplementedError(
            "StructCodec decodes BMP images, PCM WAV audio and animated "
            f"GIF video; kind={kind!r} needs a real media library")

    @staticmethod
    def _decode_gif(b: bytes) -> dict:
        d = decode_gif(b)
        frames = d["frames"]
        if not frames:
            raise ValueError("GIF with no image frames")
        f = np.concatenate([fr.reshape(-1, 3) for fr in frames]) \
            .astype(np.float32) / np.float32(255.0)
        feature = np.array([
            f[:, 0].mean(), f[:, 1].mean(), f[:, 2].mean(),
            f.std(), f.min(), f.max(),
            d["width"] / 4096.0, d["height"] / 4096.0,
        ], dtype=np.float32)
        return {"width": d["width"], "height": d["height"],
                "n_frames": len(frames), "feature": feature,
                "frames": frames}

    @staticmethod
    def _decode_bmp(b: bytes) -> dict:
        import struct
        if b[:2] != b"BM":
            raise ValueError("not a BMP payload")
        pix_off = struct.unpack_from("<I", b, 10)[0]
        hdr_sz, w, h = struct.unpack_from("<Iii", b, 14)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        comp = struct.unpack_from("<I", b, 30)[0]
        if hdr_sz < 40 or bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
        top_down = h < 0
        h_abs = abs(h)
        stride = (w * 3 + 3) & ~3            # rows padded to 4 bytes
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h_abs,
                             offset=pix_off).reshape(h_abs, stride)
        px = rows[:, :w * 3].reshape(h_abs, w, 3)      # B, G, R
        if not top_down:
            px = px[::-1]
        f = px.astype(np.float32) / np.float32(255.0)
        feature = np.array([
            f[..., 0].mean(), f[..., 1].mean(), f[..., 2].mean(),
            f.std(), f.min(), f.max(), w / 4096.0, h_abs / 4096.0,
        ], dtype=np.float32)
        return {"width": int(w), "height": int(h_abs), "n_frames": 1,
                "feature": feature, "pixels": px}

    @staticmethod
    def _decode_wav(b: bytes) -> dict:
        import struct
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(b):
            cid, sz = b[pos:pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", b, pos + 8)
            elif cid == b"data":
                data = b[pos + 8:pos + 8 + sz]
            pos += 8 + sz + (sz & 1)         # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_fmt, n_ch, rate, _, _, bits = fmt
        if audio_fmt != 1 or bits != 16:
            raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        samples = np.frombuffer(data, dtype="<i2")
        n_frames = samples.size // n_ch
        s = samples.astype(np.float32) / np.float32(32768.0)
        zc = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) \
            if s.size > 1 else 0.0
        feature = np.array([
            s.mean(), np.sqrt(np.mean(s * s)), s.min(), s.max(), s.std(),
            zc, n_frames / 1e6, rate / 1e5,
        ], dtype=np.float32)
        return {"width": -1, "height": -1, "n_frames": int(n_frames),
                "feature": feature, "samples": samples,
                "sample_rate": int(rate), "n_channels": int(n_ch)}


def make_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up, rows padded to 4 bytes) — the planted-payload writer for
    the StructCodec tests; also a handy deterministic media synthesizer."""
    import struct
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = pixels[::-1, :, ::-1]              # bottom-up, RGB -> BGR
    pad = b"\x00" * (stride - w * 3)
    for r in range(h):
        body += bgr[r].tobytes() + pad
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return bytes(hdr + body)


def make_wav(samples: np.ndarray, rate: int = 16_000,
             n_channels: int = 1) -> bytes:
    """Encode int16 samples as a PCM WAV container (StructCodec's test
    counterpart for audio)."""
    import struct
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate,
                      rate * n_channels * 2, n_channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


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


# ---------------------------------------------------------------------------
# round 5: REAL video decode — animated GIF (LZW), pure Python
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> np.ndarray:
    """GIF-flavoured LZW decompression (LSB-first variable-width codes,
    CLEAR/EOI handling, dictionary growth to 4096) -> uint8 index array.
    A per-frame Python loop over CODES (not pixels): each code appends a
    whole string, so the loop count is the compressed length."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little")
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[bytes] = []
    prev: bytes | None = None
    n_bits = bits.size
    while pos + width <= n_bits:
        code = int(bits[pos:pos + width] @ (1 << np.arange(width)))
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                 # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code}")
        out.append(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(b"".join(out), dtype=np.uint8)


def decode_gif(b: bytes) -> dict:
    """Full animated-GIF parse: logical screen, global/local color
    tables, per-frame LZW decode -> list of (h, w, 3) uint8 RGB frames
    (each frame's own rect; compositing/disposal is the caller's
    concern — feature extraction treats frames independently)."""
    import struct
    if len(b) < 14 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:                          # trailer
            break
        if blk == 0x21:                          # extension: skip subblocks
            pos += 1
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
        _l, _t, fw, fh, fpack = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        lct = gct
        if fpack & 0x80:
            n = 2 << (fpack & 0x07)
            lct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if fpack & 0x40:
            raise ValueError("interlaced GIF not supported")
        if lct is None:
            raise ValueError("GIF frame without a color table")
        min_code = b[pos]
        pos += 1
        chunks = []
        while b[pos]:
            ln = b[pos]
            chunks.append(b[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code)[:fw * fh]
        if idx.size < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        frames.append(lct[idx.reshape(fh, fw)])
    return {"width": int(sw), "height": int(sh), "frames": frames}


def make_gif(frames: list[np.ndarray], palette: np.ndarray) -> bytes:
    """Encode (h, w) uint8 INDEX arrays + an (n, 3) palette as an
    animated GIF89a.  The LZW stream is the classic no-growth encoding:
    every pixel is emitted as its own literal code with a CLEAR inserted
    before the decoder's table would force a width increase — valid
    LZW that any decoder (including :func:`decode_gif`) accepts.  The
    planted-payload writer for the video lane tests."""
    import struct
    n_col = len(palette)
    cbits = max(2, int(np.ceil(np.log2(max(n_col, 2)))))
    n_pad = 1 << cbits
    pal = np.zeros((n_pad, 3), dtype=np.uint8)
    pal[:n_col] = palette
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (cbits - 1), 0, 0)
    out += pal.tobytes()
    clear, eoi = 1 << cbits, (1 << cbits) + 1
    width = cbits + 1
    # table grows by 1 per emitted literal; CLEAR before it hits 2^width
    budget = (1 << width) - (eoi + 1) - 1
    for fr in frames:
        assert fr.shape == (h, w)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(cbits)
        codes = [clear]
        left = budget
        for px in fr.reshape(-1).tolist():
            if left == 0:
                codes.append(clear)
                left = budget
            codes.append(int(px))
            left -= 1
        codes.append(eoi)
        bits = np.zeros(len(codes) * width, dtype=np.uint8)
        for i, c in enumerate(codes):
            for j in range(width):
                bits[i * width + j] = (c >> j) & 1
        stream = np.packbits(bits, bitorder="little").tobytes()
        for off in range(0, len(stream), 255):
            chunk = stream[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)                        # sub-block terminator
    out.append(0x3B)
    return bytes(out)
