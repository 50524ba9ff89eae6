"""Delta + varint posting-list codec with block-skip and block-max metadata.

The bespoke binary state of the engine (SURVEY.md §7.4): the analog of
the reference's sink-side column codecs (``DoubleDelta``/``ZSTD`` in
``/root/reference/OneSTools.EventLog.Exporter.Core/ClickHouse/ClickHouseStorage.cs:151-182``)
and of the inverted index ElasticSearch builds for the analyzed ``text``
fields (``ElasticSearchStorage.cs:217,227,231``) — here we build it
ourselves.

Layout (little-endian)::

    [u8 version=1][u32 n_blocks][u64 n_docs_total]
    n_blocks * block header:
        u64 first_doc_id | u64 last_doc_id | u32 n_docs | u32 payload_bytes | f64 max_impact
    concatenated block payloads; each payload is three varint runs:
        doc_id gaps (first gap = doc_id - first_doc_id = 0), tfs, dls

Key properties:

- **Blocks are self-contained** (absolute ``first_doc_id`` per block), so
  two postings covering disjoint ascending doc_id ranges concatenate by
  splicing headers + payloads with NO re-encoding — this is what makes
  salted hot-term runs (salt = doc_id range bucket) cheap to merge.
- **Per-block ``max_impact``** = max over the block of the BM25
  term-frequency factor ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``; the
  block's score upper bound is ``idf * max_impact`` — the block-max WAND
  skip bound.
- Encode and decode are vectorized NumPy (no per-value Python loop).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_VERSION = 1
_FIXED = struct.Struct("<BIQ")           # version, n_blocks, n_docs_total
_BLOCK_DT = np.dtype([("first_doc", "<u8"), ("last_doc", "<u8"),
                      ("n_docs", "<u4"), ("nbytes", "<u4"),
                      ("max_impact", "<f8")])


# --------------------------------------------------------------------------
# vectorized varint
# --------------------------------------------------------------------------

def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized).

    For each value the bytes are ``(v >> 7j) & 0x7f`` with the high bit
    set on all but the last byte.  The loop below runs once per *byte
    position* (<= 10 iterations), not per value.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (>= 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(7)
        nz = tmp > 0
    nbytes = np.maximum(nbits, 1)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    max_len = int(nbytes.max())
    for j in range(max_len):
        mask = nbytes > j
        pos = offsets[:-1][mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j)
        out[pos] = byte | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varint byte run back to uint64 (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # start index of each encoded value
    starts = np.empty(int(is_last.sum()), dtype=np.int64)
    starts[0] = 0
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    j = np.arange(b.size, dtype=np.int64)
    j -= np.repeat(starts, ends - starts + 1)      # byte position within its value
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * j.astype(np.uint64))
    vals = np.add.reduceat(contrib, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"varint_decode: expected {count} values, got {vals.size}")
    return vals


# --------------------------------------------------------------------------
# posting encode / decode / concat
# --------------------------------------------------------------------------

@dataclass
class Posting:
    doc_ids: np.ndarray   # int64, strictly increasing
    tfs: np.ndarray       # int64
    dls: np.ndarray       # int64

    @property
    def df(self) -> int:
        return int(self.doc_ids.size)


def bm25_impact(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                k1: float, b: float) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_posting(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                   avgdl: float, k1: float, b: float,
                   block_size: int = 128) -> bytes:
    """Encode one term's (sorted-by-doc_id) posting into the block format."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return _FIXED.pack(_VERSION, 0, 0)
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    impacts = bm25_impact(tfs, dls, avgdl, k1, b)

    n_blocks = (n + block_size - 1) // block_size
    headers = np.empty(n_blocks, dtype=_BLOCK_DT)
    payloads: list[bytes] = []
    u_ids = doc_ids.astype(np.uint64)
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        ids = u_ids[lo:hi]
        gaps = np.empty(ids.size, dtype=np.uint64)
        gaps[0] = 0
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        payload = (varint_encode(gaps)
                   + varint_encode(np.asarray(tfs[lo:hi], dtype=np.uint64))
                   + varint_encode(np.asarray(dls[lo:hi], dtype=np.uint64)))
        headers[i] = (ids[0], ids[-1], hi - lo, len(payload),
                      float(impacts[lo:hi].max()))
        payloads.append(payload)
    return _FIXED.pack(_VERSION, n_blocks, n) + headers.tobytes() + b"".join(payloads)


def read_header(blob: bytes) -> tuple[np.ndarray, int, int]:
    """-> (block header struct array, total docs, payload start offset)."""
    version, n_blocks, n_docs = _FIXED.unpack_from(blob, 0)
    if version != _VERSION:
        raise ValueError(f"bad posting version {version}")
    hdr_off = _FIXED.size
    headers = np.frombuffer(blob, dtype=_BLOCK_DT, count=n_blocks, offset=hdr_off)
    return headers, n_docs, hdr_off + n_blocks * _BLOCK_DT.itemsize


def decode_posting(blob: bytes) -> Posting:
    """Decode a full posting (all blocks in one vectorized varint pass)."""
    headers, n_docs, payload_off = read_header(blob)
    if n_docs == 0:
        z = np.empty(0, dtype=np.int64)
        return Posting(z, z.copy(), z.copy())
    buf = np.frombuffer(blob, dtype=np.uint8, offset=payload_off)
    all_vals = varint_decode(buf, count=3 * n_docs)
    # per block the payload is [gaps, tfs, dls]; split by block doc counts
    counts = headers["n_docs"].astype(np.int64)
    doc_ids = np.empty(n_docs, dtype=np.int64)
    tfs = np.empty(n_docs, dtype=np.int64)
    dls = np.empty(n_docs, dtype=np.int64)
    vpos = 0
    opos = 0
    for i in range(counts.size):
        c = counts[i]
        gaps = all_vals[vpos:vpos + c]
        tfs[opos:opos + c] = all_vals[vpos + c:vpos + 2 * c].astype(np.int64)
        dls[opos:opos + c] = all_vals[vpos + 2 * c:vpos + 3 * c].astype(np.int64)
        ids = np.cumsum(gaps, dtype=np.uint64) + headers["first_doc"][i]
        doc_ids[opos:opos + c] = ids.astype(np.int64)
        vpos += 3 * c
        opos += c
    return Posting(doc_ids, tfs, dls)


def concat_postings(blobs: list[bytes]) -> bytes:
    """Concatenate postings over DISJOINT ascending doc_id ranges.

    Used to merge a hot term's salted runs (salt = doc_id range bucket,
    so runs arrive range-ordered): header splice only, no re-encoding.
    """
    parts = [read_header(b) + (b,) for b in blobs]
    parts = [(h, n, off, b) for (h, n, off, b) in parts if n > 0]
    if not parts:
        return _FIXED.pack(_VERSION, 0, 0)
    if len(parts) == 1:
        return parts[0][3]
    headers = np.concatenate([h for (h, _, _, _) in parts])
    firsts = headers["first_doc"].astype(np.int64)
    lasts = headers["last_doc"].astype(np.int64)
    if not (firsts[1:] > lasts[:-1]).all():
        raise ValueError("concat_postings: runs overlap or are out of order")
    n_total = int(headers["n_docs"].sum())
    payloads = b"".join(b[off:] for (_, _, off, b) in parts)
    return _FIXED.pack(_VERSION, len(headers), n_total) + headers.tobytes() + payloads


def block_max_scores(blob: bytes, idf: float) -> np.ndarray:
    """Per-block BM25 upper bounds (idf * max_impact) — WAND skip bounds."""
    headers, _, _ = read_header(blob)
    return headers["max_impact"] * idf


def decode_block(blob: bytes, block_idx: int) -> Posting:
    """Decode a single block (the block-skip read path of the WAND scorer)."""
    headers, n_docs, payload_off = read_header(blob)
    if not (0 <= block_idx < headers.size):
        raise IndexError(block_idx)
    start = payload_off + int(headers["nbytes"][:block_idx].sum())
    nb = int(headers["nbytes"][block_idx])
    c = int(headers["n_docs"][block_idx])
    vals = varint_decode(np.frombuffer(blob, dtype=np.uint8, offset=start, count=nb),
                         count=3 * c)
    ids = (np.cumsum(vals[:c], dtype=np.uint64)
           + headers["first_doc"][block_idx]).astype(np.int64)
    return Posting(ids, vals[c:2 * c].astype(np.int64), vals[2 * c:].astype(np.int64))
