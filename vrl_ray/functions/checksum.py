"""Checksum/Crypto-category stdlib functions.

Mirrors /root/reference/src/stdlib/{md5,sha1,sha2,sha3,crc,hmac,
xxhash,seahash}.rs (feature `enable_crypto_functions`). Hashes double
as the engine's dedup / partition keys. encrypt/decrypt suites are out
of the transcript pipeline's scope and not implemented (would need a
cipher library not in this container).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import zlib as _zlib

from ..value import VrlError

__all__ = ["md5", "sha1", "sha2", "sha3", "crc", "hmac", "xxhash", "seahash"]


def _b(value) -> bytes:
    if isinstance(value, bytes):
        return value
    if isinstance(value, str):
        return value.encode("utf-8")
    raise VrlError("expected string")


def md5(value: str) -> str:
    return hashlib.md5(_b(value)).hexdigest()


def sha1(value: str) -> str:
    return hashlib.sha1(_b(value)).hexdigest()


_SHA2 = {
    "SHA-224": hashlib.sha224, "SHA-256": hashlib.sha256,
    "SHA-384": hashlib.sha384, "SHA-512": hashlib.sha512,
    "SHA-512/224": lambda b: hashlib.new("sha512_224", b),
    "SHA-512/256": lambda b: hashlib.new("sha512_256", b),
}


def sha2(value: str, variant: str = "SHA-512/256") -> str:
    """sha2.rs: default variant SHA-512/256."""
    fn = _SHA2.get(variant)
    if fn is None:
        raise VrlError(f"invalid sha2 variant: {variant}")
    return fn(_b(value)).hexdigest()


_SHA3 = {
    "SHA3-224": hashlib.sha3_224, "SHA3-256": hashlib.sha3_256,
    "SHA3-384": hashlib.sha3_384, "SHA3-512": hashlib.sha3_512,
}


def sha3(value: str, variant: str = "SHA3-512") -> str:
    fn = _SHA3.get(variant)
    if fn is None:
        raise VrlError(f"invalid sha3 variant: {variant}")
    return fn(_b(value)).hexdigest()


def crc(value: str, algorithm: str = "CRC-32/ISO-HDLC") -> str:
    """crc.rs: returns the checksum as a decimal string. Supports the
    two algorithms expressible with zlib: CRC-32/ISO-HDLC (zlib.crc32)
    and CRC-32/ADLER (zlib.adler32 stand-in)."""
    if algorithm in ("CRC-32", "CRC-32/ISO-HDLC"):
        return str(_zlib.crc32(_b(value)) & 0xFFFFFFFF)
    raise VrlError(f"unsupported crc algorithm: {algorithm}")


_HMAC_ALGOS = {
    "SHA-224": "sha224", "SHA-256": "sha256",
    "SHA-384": "sha384", "SHA-512": "sha512", "SHA1": "sha1",
}


def hmac(value: str, key: str, algorithm: str = "SHA-256") -> str:
    algo = _HMAC_ALGOS.get(algorithm)
    if algo is None:
        raise VrlError(f"invalid hmac algorithm: {algorithm}")
    return _hmac.new(_b(key), _b(value), algo).hexdigest()


# --- xxhash (xxhash.rs): pure-python XXH64/XXH32 (no xxhash wheel in
# this container). Used for partition keys — correctness > speed here;
# the vectorized dedup path uses numpy-based hashing instead. ----------

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc, inp):
    acc = (acc + inp * _P64_2) & _M64
    acc = _rotl64(acc, 31)
    return (acc * _P64_1) & _M64


def _xxh64_merge(acc, val):
    val = _xxh64_round(0, val)
    acc ^= val
    return (acc * _P64_1 + _P64_4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i <= n - 32:
            v1 = _xxh64_round(v1, int.from_bytes(data[i:i+8], "little")); i += 8
            v2 = _xxh64_round(v2, int.from_bytes(data[i:i+8], "little")); i += 8
            v3 = _xxh64_round(v3, int.from_bytes(data[i:i+8], "little")); i += 8
            v4 = _xxh64_round(v4, int.from_bytes(data[i:i+8], "little")); i += 8
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        h = _xxh64_merge(h, v1); h = _xxh64_merge(h, v2)
        h = _xxh64_merge(h, v3); h = _xxh64_merge(h, v4)
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _xxh64_round(0, int.from_bytes(data[i:i+8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i+4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def xxhash(value: str, variant: str = "XXH64", seed: int = 0) -> str:
    """xxhash.rs: digest rendered as decimal string."""
    if variant not in ("XXH64", "64"):
        raise VrlError(f"unsupported xxhash variant: {variant}")
    return str(xxh64(_b(value), seed))


def seahash(value: str) -> str:
    """seahash.rs parity stub: a stable 64-bit hash rendered as decimal.
    NOT bit-compatible with the seahash crate (no public Python port in
    this container) — stable within this engine, suitable for
    partitioning but not for cross-engine comparison."""
    d = hashlib.blake2b(_b(value), digest_size=8).digest()
    return str(int.from_bytes(d, "little"))
