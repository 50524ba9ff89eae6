"""Content hashing + deterministic doc_id assignment.

The reference assigns a serial monotone ``Id`` on a single reader thread
(``/root/reference/OneSTools.EventLog/EventLogReader.cs:105-106``) —
inherently order-dependent and unusable under parallelism.  Our ids are
*content-key-derived*: ``doc_id = first 8 bytes of blake2b(repo\\0path\\0commit)
>> 1`` (63-bit non-negative), deterministic per row, independent of
partitioning, block order and cluster size (SURVEY.md §7.4).  Uniformity
of the hash also gives balanced doc_id-range salting of hot terms.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

TERM_HASH_SEED = 0x51_F0_0D


def _hash_utf8_column(values: pa.Array | pa.ChunkedArray, algo) -> pa.Array:
    """Per-row digest over the Arrow string buffers directly — no per-row
    Python str materialization (zero-copy memoryview slices)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if values.null_count:
        return pa.array([algo(v.encode("utf-8")).hexdigest()
                         if v is not None else None
                         for v in values.to_pylist()], type=pa.string())
    buffers = values.buffers()
    # [validity, offsets, data] for string/large_string
    width = 8 if pa.types.is_large_string(values.type) else 4
    offsets = np.frombuffer(buffers[1], dtype=np.int64 if width == 8 else np.int32,
                            count=len(values) + 1 + values.offset)[values.offset:]
    data = memoryview(buffers[2])
    return pa.array([algo(data[offsets[i]:offsets[i + 1]]).hexdigest()
                     for i in range(len(values))], type=pa.string())


def sha256_hex(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 hex of a utf8 column (the per-row audit invariant)."""
    return _hash_utf8_column(values, hashlib.sha256)


def md5_hex(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    return _hash_utf8_column(values, hashlib.md5)


def doc_id_from_keys(*key_cols: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Deterministic 63-bit doc_id from the NUL-joined key columns."""
    cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in key_cols]
    n = len(cols[0])
    out = np.empty(n, dtype=np.int64)
    lists = [c.to_pylist() for c in cols]
    for i in range(n):
        key = "\x00".join(str(l[i]) for l in lists).encode("utf-8")
        h = hashlib.blake2b(key, digest_size=8).digest()
        out[i] = int.from_bytes(h, "big") >> 1
    return pa.array(out, type=pa.int64())


_TERMPART_SALT = "termpart:"


def term_partition(terms: pa.Array | pa.ChunkedArray | list[str] | np.ndarray,
                   num_partitions: int) -> np.ndarray:
    """Stable shard id per term: md5-based, identical across processes,
    vectorized over the whole (unique-term) array via the fasthash
    kernel (the previous per-term ``blake2b`` Python loop cost ~1.5 µs
    x vocab per task).

    Python's builtin ``hash(str)`` is salted per process (PYTHONHASHSEED)
    and must never be used for partitioning.
    """
    import pyarrow.compute as pc
    from onestools_eventlog_ray.functions.fasthash import md5_lower64
    if isinstance(terms, (list, np.ndarray)):
        terms = pa.array(list(terms), pa.string())
    salted = pc.binary_join_element_wise(
        pa.array([_TERMPART_SALT] * len(terms), pa.string()),
        terms.cast(pa.string()) if isinstance(terms, pa.Array)
        else terms.combine_chunks().cast(pa.string()), "")
    return (md5_lower64(salted) % np.uint64(num_partitions)).astype(np.int64)


def term_partition_one(term: str, num_partitions: int) -> int:
    from onestools_eventlog_ray.functions.fasthash import md5_lower64_one
    return md5_lower64_one(_TERMPART_SALT + term) % num_partitions


GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def rollup_acc(sha_hexes, doc_ids: np.ndarray) -> int:
    """Order-independent content+identity rollup: XOR over rows of
    ``sha256_prefix64(content) XOR (doc_id * golden-ratio-odd mod 2^64)``.

    Folding the (unique) doc_id into each row's contribution makes
    duplicate contents non-cancelling — two rows with equal content but
    different ids no longer XOR to zero (round-1 ADVICE: duplicate-heavy
    corpora could collide part names / resume fingerprints)."""
    if isinstance(sha_hexes, (pa.Array, pa.ChunkedArray)):
        sha_hexes = sha_hexes.to_pylist()
    mix = (np.asarray(doc_ids, dtype=np.int64).astype(np.uint64) * GOLDEN64)
    acc = 0
    for h, m in zip(sha_hexes, mix):
        acc ^= int(h[:16], 16) ^ int(m)
    return acc


def fingerprint_combine(hash_hexes: pa.Array | pa.ChunkedArray) -> tuple[int, int]:
    """Order-independent lineage rollup of per-row content hashes.

    -> (row_count, xor of the first 8 bytes of each sha256).  Commutative,
    so partial rollups from parallel batches combine without ordering —
    the analog of the reference's byte-position lineage
    (``StreamReaderExtensions.cs:18-46``) without requiring a serial scan.
    """
    if isinstance(hash_hexes, pa.ChunkedArray):
        hash_hexes = hash_hexes.combine_chunks()
    acc = 0
    n = 0
    for h in hash_hexes.to_pylist():
        acc ^= int(h[:16], 16)
        n += 1
    return n, acc
