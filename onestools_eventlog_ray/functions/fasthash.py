"""Vectorized batch hashing kernels (md5 / sha256) + exact mod-Mersenne
arithmetic.

Why md5: the engine's probabilistic operators (MinHash, SimHash, rolling
fingerprints, fake-media features) must be *oracle-checkable* — DuckDB
exposes ``md5`` / ``md5_number_lower`` / ``sha256`` as vectorized SQL
functions, so basing every signature on md5 makes each operator exactly
SQL-expressible (the reference's only validation is sink-vs-source
reconciliation, ``/root/reference/README.md:225-231``; these oracles are
strictly stronger).

Why a DuckDB kernel: ``hashlib`` costs a Python call per value; DuckDB's
hash functions run as a C++ loop over an Arrow column (measured ~6x
faster at 200k strings, single-threaded).  One lazy per-process
connection pinned to ``threads=1`` (Ray owns the parallelism — a worker
task must not fan out its own thread pool).  Falls back to hashlib
loops if DuckDB is unavailable; both paths are bit-identical.

``md5_lower64`` matches DuckDB 1.0 ``md5_number_lower`` semantics:
bytes [8:16] of the digest, little-endian (verified empirically).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MERSENNE61 = np.uint64((1 << 61) - 1)

_CON = None
_HAVE_DUCKDB: bool | None = None


def _kernel():
    """Lazy per-process DuckDB connection (threads=1, order-preserving)."""
    global _CON, _HAVE_DUCKDB
    if _HAVE_DUCKDB is None:
        try:
            import duckdb
            _CON = duckdb.connect()
            _CON.execute("SET threads TO 1")
            _CON.execute("SET preserve_insertion_order TO true")
            _HAVE_DUCKDB = True
        except ImportError:          # pragma: no cover - duckdb is baked in
            _HAVE_DUCKDB = False
    return _CON


def _as_string_array(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(list(values), pa.string())
    return values


def md5_lower64(values) -> np.ndarray:
    """Per-row md5 lower 64 bits (DuckDB ``md5_number_lower`` semantics)
    of a utf8 column -> uint64 array."""
    arr = _as_string_array(values)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    con = _kernel()
    if con is not None:
        t = pa.table({"s": arr})
        con.register("_fh_in", t)
        try:
            out = con.execute(
                "SELECT md5_number_lower(s) AS h FROM _fh_in").arrow()
        finally:
            con.unregister("_fh_in")
        return out["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16],
                        "little") for s in arr.to_pylist()),
        dtype=np.uint64, count=len(arr))


def md5_lower64_one(s: str) -> int:
    """Scalar form (query-side / test helper)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16],
                          "little")


def md5_hex_fast(values) -> pa.Array:
    """Per-row md5 hex of a utf8 column (DuckDB kernel, hashlib fallback)."""
    arr = _as_string_array(values)
    if len(arr) == 0:
        return pa.array([], pa.string())
    con = _kernel()
    if con is not None:
        t = pa.table({"s": arr})
        con.register("_fh_in", t)
        try:
            out = con.execute("SELECT md5(s) AS h FROM _fh_in").arrow()
        finally:
            con.unregister("_fh_in")
        h = out["h"]
        return h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
    return pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                     for s in arr.to_pylist()], pa.string())


def sha256_hex_fast(values) -> pa.Array:
    """Per-row sha256 hex of a utf8 column (DuckDB kernel, hashlib fallback)."""
    arr = _as_string_array(values)
    if len(arr) == 0:
        return pa.array([], pa.string())
    con = _kernel()
    if con is not None:
        t = pa.table({"s": arr})
        con.register("_fh_in", t)
        try:
            out = con.execute("SELECT sha256(s) AS h FROM _fh_in").arrow()
        finally:
            con.unregister("_fh_in")
        h = out["h"]
        return h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
    return pa.array([hashlib.sha256(s.encode("utf-8")).hexdigest()
                     for s in arr.to_pylist()], pa.string())


# ---------------------------------------------------------------------------
# exact modular arithmetic (vectorized, no 128-bit ints needed)
# ---------------------------------------------------------------------------

def mulmod_p61(x: np.ndarray, y) -> np.ndarray:
    """Exact ``(x * y) % (2^61 - 1)`` for uint64 inputs < 2^61, fully
    vectorized via 32-bit limb splitting + Mersenne folding (2^61 = 1
    mod p, 2^64 = 8 mod p).  Matches DuckDB HUGEINT arithmetic exactly —
    the SQL-oracle-parity requirement the old wrap-around hash family
    violated (ADVICE.md round 1)."""
    p = MERSENNE61
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64) if not np.isscalar(y) \
        else np.uint64(y)
    m32 = np.uint64(0xFFFFFFFF)
    xh, xl = x >> np.uint64(32), x & m32
    yh, yl = y >> np.uint64(32), y & m32
    # prod = hh*2^64 + mid*2^32 + ll ; each partial fits u64
    hh = xh * yh                       # < 2^58
    mid = xh * yl + xl * yh            # < 2^62
    ll = xl * yl                       # < 2^64
    c1 = (hh * np.uint64(8)) % p       # hh*2^64 mod p, hh*8 < 2^61
    # mid*2^32 mod p: mid = u*2^29 + v -> u*2^61 + v*2^32 = u + v*2^32 (mod p)
    u = mid >> np.uint64(29)
    v = mid & np.uint64((1 << 29) - 1)
    c2 = (u + (v << np.uint64(32))) % p
    c3 = ((ll >> np.uint64(61)) + (ll & p)) % p
    return (c1 + c2 + c3) % p


def poly_hash_p61(token_hashes: np.ndarray, doc_offsets: np.ndarray,
                  base: int = 1_000_003) -> np.ndarray:
    """Per-document polynomial (Rabin-Karp) hash over a flattened token
    stream, exact mod 2^61-1, vectorized.

    ``token_hashes``: uint64 (< 2^61) per flattened token;
    ``doc_offsets``: int64 list offsets (len n_docs+1) into the flat array.
    fingerprint(doc) = sum_j h_j * base^(dl-1-j)  mod p
    == the left-fold ``acc*base + h`` the SQL oracle computes with
    ``list_reduce`` (identical exact arithmetic mod p)."""
    p = MERSENNE61
    n_docs = doc_offsets.size - 1
    flat_n = int(doc_offsets[-1])
    out = np.zeros(n_docs, dtype=np.uint64)
    if flat_n == 0:
        return out
    dl = np.diff(doc_offsets).astype(np.int64)
    max_dl = int(dl.max())
    # base powers mod p (tiny Python loop over max doc length only)
    pows = np.empty(max_dl + 1, dtype=np.uint64)
    pows[0] = 1
    b = np.uint64(base)
    for i in range(1, max_dl + 1):
        pows[i] = mulmod_p61(pows[i - 1:i], b)[0]
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), dl)
    pos = np.arange(flat_n, dtype=np.int64) - doc_offsets[:-1][parent]
    exp = dl[parent] - 1 - pos
    prod = mulmod_p61(token_hashes % p, pows[exp])      # < 2^61 each
    # per-doc sum mod p without 128-bit: split into 32-bit limbs, reduceat
    starts = doc_offsets[:-1].astype(np.int64)
    nonempty = dl > 0
    lo = np.zeros(n_docs, dtype=np.uint64)
    hi = np.zeros(n_docs, dtype=np.uint64)
    if nonempty.any():
        s = starts[nonempty]
        lo[nonempty] = np.add.reduceat(prod & np.uint64(0xFFFFFFFF), s)
        hi[nonempty] = np.add.reduceat(prod >> np.uint64(32), s)
    out = (mulmod_p61(hi % p, np.uint64(1) << np.uint64(32)) + lo % p) % p
    out[~nonempty] = 0
    return out
