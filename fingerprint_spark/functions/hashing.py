"""Content identity: xxhash64, SimHash, MinHash, canonical content_hash.

Reference analog: src/dsl/content_hash.rs:7-69 hashes a canonicalized
(recursively key-sorted) JSON encoding of selected extracts; here the
canonical encoding is a fixed-field-order struct serialized with
``to_json`` and hashed JVM-side (md5/xxhash64) — same determinism
guarantee, zero Python.

SimHash/MinHash (the north_star's near-dup identity) are Arrow-batched
numpy UDFs over word shingles; the per-doc output is a single int64
(SimHash) or array<long> signature (MinHash), so the expensive text never
shuffles — only the compact sketches do. At 100 TB that is the difference
between shuffling ~100 TB and shuffling ~100 GB.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def _shingles(text: str, k: int) -> list[str]:
    words = (text or "").lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i: i + k]) for i in range(len(words) - k + 1)]


def _shingle_hashes64(text: str, k: int) -> "np.ndarray":
    """uint64 hash per word k-shingle: blake2b-64 (C speed, one call per
    shingle) — deterministic across processes with 64 INDEPENDENT bits.

    Not CRC32-based: crc32 is GF(2)-linear, so any crc-derived high word
    is a linear function of the low word (a seeded crc32(s, salt) equals
    crc32(s) XOR a length-dependent constant), collapsing the hash to 32
    bits of entropy and correlating SimHash bits 32-63 with bits 0-31 —
    which distorts Hamming distances and the 16-bit chunk bucketing built
    on them. blake2b costs ~0.7us/shingle vs ~0.3 for dual-crc32;
    uncorrelatedness of hi/lo words is asserted in tests."""
    shingles = _shingles(text, k)
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    blake2b = hashlib.blake2b
    return np.fromiter(
        (
            int.from_bytes(
                blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
            )
            for s in shingles
        ),
        dtype=np.uint64, count=len(shingles),
    )


def simhash64_py(text: str, k: int = 3) -> int:
    """64-bit SimHash over word k-shingles (signed int64 for Spark).
    Bit-majority accumulated with numpy unpackbits — vectorized."""
    h = _shingle_hashes64(text, k)
    if h.size == 0:
        return 0
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0) * 2 > h.size  # majority per bit position
    out = int(
        np.packbits(votes.astype(np.uint8), bitorder="little")
        .view(np.uint64)[0]
    )
    return out - (1 << 64) if out >= (1 << 63) else out


# universal-hash parameters over the 31-bit Mersenne prime: a,b,h < 2^31
# so a*h+b < 2^62 fits exactly in uint64 — standard 32-bit MinHash
_MINHASH_P = (1 << 31) - 1


@lru_cache(maxsize=4)
def _minhash_params(num_hashes: int):
    a = np.array(
        [(((2 * i + 1) * 0x9E3779B9) % _MINHASH_P) | 1 for i in range(num_hashes)],
        dtype=np.uint64,
    )[:, None]
    b = np.array(
        [((i + 1) * 0x85EBCA6B) % _MINHASH_P for i in range(num_hashes)],
        dtype=np.uint64,
    )[:, None]
    return a, b


def minhash_signature_py(text: str, num_hashes: int = 64, k: int = 3) -> list[int]:
    """MinHash signature via one base hash + universal-hash mixing.

    h_i(x) = (a_i * h(x) + b_i) mod p, p = 2^31-1 — each shingle hashed
    once with crc32, all permutations applied as one (num_hashes x
    n_shingles) uint64 broadcast, min along shingles. Fully vectorized."""
    base = _shingle_hashes64(text, k)
    if base.size == 0:
        return [0] * num_hashes
    a, b = _minhash_params(num_hashes)
    h = (base % np.uint64(_MINHASH_P))[None, :]
    sig = ((a * h + b) % np.uint64(_MINHASH_P)).min(axis=1)
    return [int(x) for x in sig]


@lru_cache(maxsize=2)
def _simhash_udf(k: int):
    @F.pandas_udf(T.LongType())
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series([simhash64_py(t, k) for t in texts], dtype="int64")

    return udf


@lru_cache(maxsize=2)
def _minhash_udf(num_hashes: int, k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series([minhash_signature_py(t, num_hashes, k) for t in texts])

    return udf


def simhash64_col(text: Column, k: int = 3) -> Column:
    return _simhash_udf(k)(text)


def minhash_signature_col(text: Column, num_hashes: int = 64, k: int = 3) -> Column:
    return _minhash_udf(num_hashes, k)(text)


def content_hash_col(*cols: Column, algo: str = "md5") -> Column:
    """Canonical content hash over a fixed-order tuple of columns.

    Fields are serialized in the given order (reference: ``over`` order,
    content_hash.rs:24-31) with presence tags: null -> the literal tag
    ``\\x02missing`` (content_hash.rs presence-tagged 0x01/0x02 encoding),
    separated by 0xFF-analog '\\x7f'. JVM-side end to end.
    """
    parts = []
    for c in cols:
        parts.append(
            F.when(c.isNull(), F.lit("\x02missing")).otherwise(
                F.concat(F.lit("\x01"), c.cast("string"))
            )
        )
    canonical = F.concat_ws("\x7f", *parts)
    if algo == "md5":
        return F.concat(F.lit("md5:"), F.md5(canonical))
    if algo == "sha256":
        return F.concat(F.lit("sha256:"), F.sha2(canonical, 256))
    if algo == "xxhash64":
        return F.concat(F.lit("xxh64:"), F.conv(F.hex(F.xxhash64(canonical)), 16, 16))
    raise ValueError(f"unknown algo {algo}")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 SimHashes — bit_count(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def canonical_text_col(text: Column) -> Column:
    """Case/whitespace canonicalization before content hashing."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
