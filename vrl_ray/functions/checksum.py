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


# Generic parametric CRC (RevEng catalogue params: width, poly, init,
# refin, refout, xorout) — the same catalogue the `crc` crate ships.
_CRC_PARAMS = {
    "CRC_32_ISO_HDLC": (32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
    "CRC_32_CKSUM": (32, 0x04C11DB7, 0x00000000, False, False, 0xFFFFFFFF),
    "CRC_32_BZIP2": (32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0xFFFFFFFF),
    "CRC_32_MPEG_2": (32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0x00000000),
    "CRC_32_ISCSI": (32, 0x1EDC6F41, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
    "CRC_32_JAMCRC": (32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0x00000000),
    "CRC_32_XFER": (32, 0x000000AF, 0x00000000, False, False, 0x00000000),
    "CRC_32_AIXM": (32, 0x814141AB, 0x00000000, False, False, 0x00000000),
    "CRC_32_AUTOSAR": (32, 0xF4ACFB13, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
    "CRC_32_BASE91_D": (32, 0xA833982B, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
    "CRC_32_CD_ROM_EDC": (32, 0x8001801B, 0x00000000, True, True, 0x00000000),
    "CRC_16_IBM_3740": (16, 0x1021, 0xFFFF, False, False, 0x0000),
    "CRC_16_ARC": (16, 0x8005, 0x0000, True, True, 0x0000),
    "CRC_16_XMODEM": (16, 0x1021, 0x0000, False, False, 0x0000),
    "CRC_16_MODBUS": (16, 0x8005, 0xFFFF, True, True, 0x0000),
    "CRC_16_KERMIT": (16, 0x1021, 0x0000, True, True, 0x0000),
    "CRC_16_USB": (16, 0x8005, 0xFFFF, True, True, 0xFFFF),
    "CRC_8_SMBUS": (8, 0x07, 0x00, False, False, 0x00),
    "CRC_8_MAXIM_DOW": (8, 0x31, 0x00, True, True, 0x00),
    "CRC_64_ECMA_182": (64, 0x42F0E1EBA9EA3693, 0x0, False, False, 0x0),
    "CRC_64_XZ": (64, 0x42F0E1EBA9EA3693,
                  0xFFFFFFFFFFFFFFFF, True, True, 0xFFFFFFFFFFFFFFFF),
}


def _reflect(x: int, width: int) -> int:
    r = 0
    for _ in range(width):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _crc_generic(data: bytes, width, poly, init, refin, refout, xorout) -> int:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    crc_v = init
    for byte in data:
        if refin:
            byte = _reflect(byte, 8)
        crc_v ^= byte << (width - 8)
        for _ in range(8):
            crc_v = ((crc_v << 1) ^ poly) if crc_v & top else (crc_v << 1)
            crc_v &= mask
    if refout:
        crc_v = _reflect(crc_v, width)
    return (crc_v ^ xorout) & mask


def crc(value: str, algorithm: str = "CRC_32_ISO_HDLC") -> str:
    """crc.rs: parametric CRC over the RevEng catalogue (the subset of
    the `crc` crate's algorithm list above); decimal-string digest."""
    algorithm = algorithm.replace("-", "_").replace("/", "_")
    if algorithm in ("CRC_32", "CRC_32_ISO_HDLC"):
        return str(_zlib.crc32(_b(value)) & 0xFFFFFFFF)
    params = _CRC_PARAMS.get(algorithm)
    if params is None:
        raise VrlError(f"unsupported crc algorithm: {algorithm}")
    return str(_crc_generic(_b(value), *params))


_HMAC_ALGOS = {
    "SHA-224": "sha224", "SHA-256": "sha256",
    "SHA-384": "sha384", "SHA-512": "sha512", "SHA1": "sha1",
}


def hmac(value: str, key: str, algorithm: str = "SHA-256") -> bytes:
    """hmac.rs: returns the RAW digest bytes (callers encode with
    encode_base16/encode_base64)."""
    algo = _HMAC_ALGOS.get(algorithm)
    if algo is None:
        raise VrlError(f"invalid hmac algorithm: {algorithm}")
    return _hmac.new(_b(key), _b(value), algo).digest()


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


_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl32(x, r):
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P32_1 + _P32_2) & _M32
        v2 = (seed + _P32_2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P32_1) & _M32
        while i <= n - 16:
            for _ in range(1):
                pass
            v1 = (_rotl32((v1 + int.from_bytes(data[i:i+4], "little") * _P32_2) & _M32, 13) * _P32_1) & _M32; i += 4
            v2 = (_rotl32((v2 + int.from_bytes(data[i:i+4], "little") * _P32_2) & _M32, 13) * _P32_1) & _M32; i += 4
            v3 = (_rotl32((v3 + int.from_bytes(data[i:i+4], "little") * _P32_2) & _M32, 13) * _P32_1) & _M32; i += 4
            v4 = (_rotl32((v4 + int.from_bytes(data[i:i+4], "little") * _P32_2) & _M32, 13) * _P32_1) & _M32; i += 4
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P32_5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        h = (h + int.from_bytes(data[i:i+4], "little") * _P32_3) & _M32
        h = (_rotl32(h, 17) * _P32_4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P32_5) & _M32
        h = (_rotl32(h, 11) * _P32_1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P32_2) & _M32
    h ^= h >> 13
    h = (h * _P32_3) & _M32
    h ^= h >> 16
    return h


def xxhash(value: str, variant: str = "XXH32", seed: int = 0) -> int:
    """xxhash.rs: integer digest; default variant XXH32. 64-bit
    results wrap into i64 like all VRL integers."""
    from ..value import wrap_i64
    if variant in ("XXH32", "32"):
        return xxh32(_b(value), seed)
    if variant in ("XXH64", "64"):
        return wrap_i64(xxh64(_b(value), seed))
    raise VrlError(f"unsupported xxhash variant: {variant}")


def _sea_diffuse(x: int) -> int:
    x = (x * 0x6EED0E9DA4D94A4F) & _M64
    a = x >> 32
    b = x >> 60
    x ^= a >> b
    return (x * 0x6EED0E9DA4D94A4F) & _M64


def seahash(value: str) -> int:
    """seahash.rs: bit-compatible pure-Python port of the public
    SeaHash algorithm (reference vectors in docs/generated/
    seahash.json); i64-wrapped like all VRL integers."""
    from ..value import wrap_i64
    data = _b(value)
    n = len(data)
    state = [0x16F11FE89B0D677C, 0xB480A793D8E6C86C,
             0x6FE2E5AAF078EBC9, 0x14F994A4C5259381]
    i = 0
    idx = 0
    while i + 8 <= n:
        chunk = int.from_bytes(data[i:i + 8], "little")
        state[idx & 3] = _sea_diffuse(state[idx & 3] ^ chunk)
        idx += 1
        i += 8
    if i < n:
        chunk = int.from_bytes(data[i:], "little")
        state[idx & 3] = _sea_diffuse(state[idx & 3] ^ chunk)
    h = _sea_diffuse(state[0] ^ state[1] ^ state[2] ^ state[3] ^ n)
    return wrap_i64(h)
