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

from functools import lru_cache

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


def simhash64_py(text: str, k: int = 3) -> int:
    """64-bit SimHash over word k-shingles (signed int64 for Spark)."""
    v = [0] * 64
    for sh in _shingles(text, k):
        h = fnv1a64(sh.encode("utf-8"))
        for bit in range(64):
            v[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if v[bit] > 0:
            out |= 1 << bit
    return out - (1 << 64) if out >= (1 << 63) else out


def minhash_signature_py(text: str, num_hashes: int = 64, k: int = 3) -> list[int]:
    """MinHash signature via one base hash + universal-hash mixing.

    h_i(x) = (a_i * h(x) + b_i) mod p — the standard single-pass trick so
    each shingle is hashed once, not num_hashes times.
    """
    shingles = _shingles(text, k)
    if not shingles:
        return [0] * num_hashes
    base = [fnv1a64(s.encode("utf-8")) for s in shingles]
    p = (1 << 61) - 1
    sig = []
    for i in range(num_hashes):
        a = (2 * i + 1) * 0x9E3779B97F4A7C15 & _MASK64 | 1
        b = (i + 1) * 0xC2B2AE3D27D4EB4F & _MASK64
        m = min(((a * h + b) % p) for h in base)
        sig.append(m & 0x7FFFFFFFFFFFFFFF)
    return sig


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
