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


# Generic parametric CRC. Params (width, poly, init, refin, refout,
# xorout, check) from the published CRC RevEng catalogue — the same
# catalogue behind the `crc` crate's constants the reference matches
# on (crc.rs:7-118). `check` is the catalogue's CRC of b"123456789";
# tests assert computed-check == catalogued-check for every entry,
# so a wrong parameter can't pass silently.
_CRC_PARAMS = {
    "CRC_3_GSM": (3, 0x3, 0x0, False, False, 0x7, 0x4),
    "CRC_3_ROHC": (3, 0x3, 0x7, True, True, 0x0, 0x6),
    "CRC_4_G_704": (4, 0x3, 0x0, True, True, 0x0, 0x7),
    "CRC_4_INTERLAKEN": (4, 0x3, 0xF, False, False, 0xF, 0xB),
    "CRC_5_EPC_C1G2": (5, 0x09, 0x09, False, False, 0x00, 0x00),
    "CRC_5_G_704": (5, 0x15, 0x00, True, True, 0x00, 0x07),
    "CRC_5_USB": (5, 0x05, 0x1F, True, True, 0x1F, 0x19),
    "CRC_6_CDMA2000_A": (6, 0x27, 0x3F, False, False, 0x00, 0x0D),
    "CRC_6_CDMA2000_B": (6, 0x07, 0x3F, False, False, 0x00, 0x3B),
    "CRC_6_DARC": (6, 0x19, 0x00, True, True, 0x00, 0x26),
    "CRC_6_GSM": (6, 0x2F, 0x00, False, False, 0x3F, 0x13),
    "CRC_6_G_704": (6, 0x03, 0x00, True, True, 0x00, 0x06),
    "CRC_7_MMC": (7, 0x09, 0x00, False, False, 0x00, 0x75),
    "CRC_7_ROHC": (7, 0x4F, 0x7F, True, True, 0x00, 0x53),
    "CRC_7_UMTS": (7, 0x45, 0x00, False, False, 0x00, 0x61),
    "CRC_8_AUTOSAR": (8, 0x2F, 0xFF, False, False, 0xFF, 0xDF),
    "CRC_8_BLUETOOTH": (8, 0xA7, 0x00, True, True, 0x00, 0x26),
    "CRC_8_CDMA2000": (8, 0x9B, 0xFF, False, False, 0x00, 0xDA),
    "CRC_8_DARC": (8, 0x39, 0x00, True, True, 0x00, 0x15),
    "CRC_8_DVB_S2": (8, 0xD5, 0x00, False, False, 0x00, 0xBC),
    "CRC_8_GSM_A": (8, 0x1D, 0x00, False, False, 0x00, 0x37),
    "CRC_8_GSM_B": (8, 0x49, 0x00, False, False, 0xFF, 0x94),
    "CRC_8_HITAG": (8, 0x1D, 0xFF, False, False, 0x00, 0xB4),
    "CRC_8_I_432_1": (8, 0x07, 0x00, False, False, 0x55, 0xA1),
    "CRC_8_I_CODE": (8, 0x1D, 0xFD, False, False, 0x00, 0x7E),
    "CRC_8_LTE": (8, 0x9B, 0x00, False, False, 0x00, 0xEA),
    "CRC_8_MAXIM_DOW": (8, 0x31, 0x00, True, True, 0x00, 0xA1),
    "CRC_8_MIFARE_MAD": (8, 0x1D, 0xC7, False, False, 0x00, 0x99),
    "CRC_8_NRSC_5": (8, 0x31, 0xFF, False, False, 0x00, 0xF7),
    "CRC_8_OPENSAFETY": (8, 0x2F, 0x00, False, False, 0x00, 0x3E),
    "CRC_8_ROHC": (8, 0x07, 0xFF, True, True, 0x00, 0xD0),
    "CRC_8_SAE_J1850": (8, 0x1D, 0xFF, False, False, 0xFF, 0x4B),
    "CRC_8_SMBUS": (8, 0x07, 0x00, False, False, 0x00, 0xF4),
    "CRC_8_TECH_3250": (8, 0x1D, 0xFF, True, True, 0x00, 0x97),
    "CRC_8_WCDMA": (8, 0x9B, 0x00, True, True, 0x00, 0x25),
    "CRC_10_ATM": (10, 0x233, 0x000, False, False, 0x000, 0x199),
    "CRC_10_CDMA2000": (10, 0x3D9, 0x3FF, False, False, 0x000, 0x233),
    "CRC_10_GSM": (10, 0x175, 0x000, False, False, 0x3FF, 0x12A),
    "CRC_11_FLEXRAY": (11, 0x385, 0x01A, False, False, 0x000, 0x5A3),
    "CRC_11_UMTS": (11, 0x307, 0x000, False, False, 0x000, 0x061),
    "CRC_12_CDMA2000": (12, 0xF13, 0xFFF, False, False, 0x000, 0xD4D),
    "CRC_12_DECT": (12, 0x80F, 0x000, False, False, 0x000, 0xF5B),
    "CRC_12_GSM": (12, 0xD31, 0x000, False, False, 0xFFF, 0xB34),
    "CRC_12_UMTS": (12, 0x80F, 0x000, False, True, 0x000, 0xDAF),
    "CRC_13_BBC": (13, 0x1CF5, 0x0000, False, False, 0x0000, 0x04FA),
    "CRC_14_DARC": (14, 0x0805, 0x0000, True, True, 0x0000, 0x082D),
    "CRC_14_GSM": (14, 0x202D, 0x0000, False, False, 0x3FFF, 0x30AE),
    "CRC_15_CAN": (15, 0x4599, 0x0000, False, False, 0x0000, 0x059E),
    "CRC_15_MPT1327": (15, 0x6815, 0x0000, False, False, 0x0001, 0x2566),
    "CRC_16_ARC": (16, 0x8005, 0x0000, True, True, 0x0000, 0xBB3D),
    "CRC_16_CDMA2000": (16, 0xC867, 0xFFFF, False, False, 0x0000, 0x4C06),
    "CRC_16_CMS": (16, 0x8005, 0xFFFF, False, False, 0x0000, 0xAEE7),
    "CRC_16_DDS_110": (16, 0x8005, 0x800D, False, False, 0x0000, 0x9ECF),
    "CRC_16_DECT_R": (16, 0x0589, 0x0000, False, False, 0x0001, 0x007E),
    "CRC_16_DECT_X": (16, 0x0589, 0x0000, False, False, 0x0000, 0x007F),
    "CRC_16_DNP": (16, 0x3D65, 0x0000, True, True, 0xFFFF, 0xEA82),
    "CRC_16_EN_13757": (16, 0x3D65, 0x0000, False, False, 0xFFFF, 0xC2B7),
    "CRC_16_GENIBUS": (16, 0x1021, 0xFFFF, False, False, 0xFFFF, 0xD64E),
    "CRC_16_GSM": (16, 0x1021, 0x0000, False, False, 0xFFFF, 0xCE3C),
    "CRC_16_IBM_3740": (16, 0x1021, 0xFFFF, False, False, 0x0000, 0x29B1),
    "CRC_16_IBM_SDLC": (16, 0x1021, 0xFFFF, True, True, 0xFFFF, 0x906E),
    "CRC_16_ISO_IEC_14443_3_A": (16, 0x1021, 0xC6C6, True, True, 0x0000,
                                 0xBF05),
    "CRC_16_KERMIT": (16, 0x1021, 0x0000, True, True, 0x0000, 0x2189),
    "CRC_16_LJ1200": (16, 0x6F63, 0x0000, False, False, 0x0000, 0xBDF4),
    "CRC_16_M17": (16, 0x5935, 0xFFFF, False, False, 0x0000, 0x772B),
    "CRC_16_MAXIM_DOW": (16, 0x8005, 0x0000, True, True, 0xFFFF, 0x44C2),
    "CRC_16_MCRF4XX": (16, 0x1021, 0xFFFF, True, True, 0x0000, 0x6F91),
    "CRC_16_MODBUS": (16, 0x8005, 0xFFFF, True, True, 0x0000, 0x4B37),
    "CRC_16_NRSC_5": (16, 0x080B, 0xFFFF, True, True, 0x0000, 0xA066),
    "CRC_16_OPENSAFETY_A": (16, 0x5935, 0x0000, False, False, 0x0000,
                            0x5D38),
    "CRC_16_OPENSAFETY_B": (16, 0x755B, 0x0000, False, False, 0x0000,
                            0x20FE),
    "CRC_16_PROFIBUS": (16, 0x1DCF, 0xFFFF, False, False, 0xFFFF, 0xA819),
    "CRC_16_RIELLO": (16, 0x1021, 0xB2AA, True, True, 0x0000, 0x63D0),
    "CRC_16_SPI_FUJITSU": (16, 0x1021, 0x1D0F, False, False, 0x0000,
                           0xE5CC),
    "CRC_16_T10_DIF": (16, 0x8BB7, 0x0000, False, False, 0x0000, 0xD0DB),
    "CRC_16_TELEDISK": (16, 0xA097, 0x0000, False, False, 0x0000, 0x0FB3),
    "CRC_16_TMS37157": (16, 0x1021, 0x89EC, True, True, 0x0000, 0x26B1),
    "CRC_16_UMTS": (16, 0x8005, 0x0000, False, False, 0x0000, 0xFEE8),
    "CRC_16_USB": (16, 0x8005, 0xFFFF, True, True, 0xFFFF, 0xB4C8),
    "CRC_16_XMODEM": (16, 0x1021, 0x0000, False, False, 0x0000, 0x31C3),
    "CRC_17_CAN_FD": (17, 0x1685B, 0x00000, False, False, 0x00000,
                      0x04F03),
    "CRC_21_CAN_FD": (21, 0x102899, 0x000000, False, False, 0x000000,
                      0x0ED841),
    "CRC_24_BLE": (24, 0x00065B, 0x555555, True, True, 0x000000,
                   0xC25A56),
    "CRC_24_FLEXRAY_A": (24, 0x5D6DCB, 0xFEDCBA, False, False, 0x000000,
                         0x7979BD),
    "CRC_24_FLEXRAY_B": (24, 0x5D6DCB, 0xABCDEF, False, False, 0x000000,
                         0x1F23B8),
    "CRC_24_INTERLAKEN": (24, 0x328B63, 0xFFFFFF, False, False, 0xFFFFFF,
                          0xB4F3E6),
    "CRC_24_LTE_A": (24, 0x864CFB, 0x000000, False, False, 0x000000,
                     0xCDE703),
    "CRC_24_LTE_B": (24, 0x800063, 0x000000, False, False, 0x000000,
                     0x23EF52),
    "CRC_24_OPENPGP": (24, 0x864CFB, 0xB704CE, False, False, 0x000000,
                       0x21CF02),
    "CRC_24_OS_9": (24, 0x800063, 0xFFFFFF, False, False, 0xFFFFFF,
                    0x200FA5),
    "CRC_30_CDMA": (30, 0x2030B9C7, 0x3FFFFFFF, False, False, 0x3FFFFFFF,
                    0x04C34ABF),
    "CRC_31_PHILIPS": (31, 0x04C11DB7, 0x7FFFFFFF, False, False,
                       0x7FFFFFFF, 0x0CE9E46C),
    "CRC_32_AIXM": (32, 0x814141AB, 0x00000000, False, False, 0x00000000,
                    0x3010BF7F),
    "CRC_32_AUTOSAR": (32, 0xF4ACFB13, 0xFFFFFFFF, True, True, 0xFFFFFFFF,
                       0x1697D06A),
    "CRC_32_BASE91_D": (32, 0xA833982B, 0xFFFFFFFF, True, True,
                        0xFFFFFFFF, 0x87315576),
    "CRC_32_BZIP2": (32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0xFFFFFFFF,
                     0xFC891918),
    "CRC_32_CD_ROM_EDC": (32, 0x8001801B, 0x00000000, True, True,
                          0x00000000, 0x6EC2EDC4),
    "CRC_32_CKSUM": (32, 0x04C11DB7, 0x00000000, False, False, 0xFFFFFFFF,
                     0x765E7680),
    "CRC_32_ISCSI": (32, 0x1EDC6F41, 0xFFFFFFFF, True, True, 0xFFFFFFFF,
                     0xE3069283),
    "CRC_32_ISO_HDLC": (32, 0x04C11DB7, 0xFFFFFFFF, True, True,
                        0xFFFFFFFF, 0xCBF43926),
    "CRC_32_JAMCRC": (32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0x00000000,
                      0x340BC6D9),
    "CRC_32_MEF": (32, 0x741B8CD7, 0xFFFFFFFF, True, True, 0x00000000,
                   0xD2C22F51),
    "CRC_32_MPEG_2": (32, 0x04C11DB7, 0xFFFFFFFF, False, False,
                      0x00000000, 0x0376E6E7),
    "CRC_32_XFER": (32, 0x000000AF, 0x00000000, False, False, 0x00000000,
                    0xBD0BE338),
    "CRC_40_GSM": (40, 0x0004820009, 0x0000000000, False, False,
                   0xFFFFFFFFFF, 0xD4164FC646),
    "CRC_64_ECMA_182": (64, 0x42F0E1EBA9EA3693, 0x0, False, False, 0x0,
                        0x6C40DF5F0B497347),
    "CRC_64_GO_ISO": (64, 0x000000000000001B, 0xFFFFFFFFFFFFFFFF, True,
                      True, 0xFFFFFFFFFFFFFFFF, 0xB90956C775A41001),
    "CRC_64_MS": (64, 0x259C84CBA6426349, 0xFFFFFFFFFFFFFFFF, True, True,
                  0x0000000000000000, 0x75D4B74F024ECEEA),
    "CRC_64_REDIS": (64, 0xAD93D23594C935A9, 0x0000000000000000, True,
                     True, 0x0000000000000000, 0xE9C6D914C4B8D9CA),
    "CRC_64_WE": (64, 0x42F0E1EBA9EA3693, 0xFFFFFFFFFFFFFFFF, False,
                  False, 0xFFFFFFFFFFFFFFFF, 0x62EC59E3F1A4F00A),
    "CRC_64_XZ": (64, 0x42F0E1EBA9EA3693, 0xFFFFFFFFFFFFFFFF, True, True,
                  0xFFFFFFFFFFFFFFFF, 0x995DC9BBDF1939FA),
    "CRC_82_DARC": (82, 0x0308C0111011401440411, 0x0, True, True, 0x0,
                    0x09EA83F625023801FD612),
}


def _reflect(x: int, width: int) -> int:
    r = 0
    for _ in range(width):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _crc_generic(data: bytes, width, poly, init, refin, refout,
                 xorout) -> int:
    """Bit-serial MSB-first CRC, valid for ANY width (3..82 in the
    catalogue — sub-byte widths and >64-bit polys included, which a
    byte-shifted register can't express)."""
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    crc_v = init & mask
    for byte in data:
        if refin:
            byte = _reflect(byte, 8)
        for i in range(7, -1, -1):
            hi = 1 if crc_v & top else 0
            crc_v = (crc_v << 1) & mask
            if hi ^ ((byte >> i) & 1):
                crc_v ^= poly
    if refout:
        crc_v = _reflect(crc_v, width)
    return (crc_v ^ xorout) & mask


def crc(value: str, algorithm: str = "CRC_32_ISO_HDLC") -> str:
    """crc.rs:585-926: parametric CRC over the full RevEng catalogue
    (112 algorithms, the `crc` crate's constant set); decimal-string
    digest. Name matching is uppercase-only, as the reference's."""
    algorithm = algorithm.upper()
    if algorithm == "CRC_32_ISO_HDLC":
        return str(_zlib.crc32(_b(value)) & 0xFFFFFFFF)
    params = _CRC_PARAMS.get(algorithm)
    if params is None:
        raise VrlError(f"Invalid CRC algorithm: {algorithm}")
    return str(_crc_generic(_b(value), *params[:6]))


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


# --- XXH3 (64 + 128): pure-python port of the public xxHash v0.8
# specification, unseeded with the default 192-byte secret (the form
# xxhash.rs calls: xxh3::xxh3_64 / xxh3_128). Verified against the
# reference's own doc-example vectors ("foo") and the published
# empty-input vector; longer-length paths follow the spec layout
# (len 4-8 / 9-16 / 17-128 / 129-240 / long-with-accumulators). -------

# The canonical 192-byte kSecret from the public xxHash v0.8 spec,
# cross-checked byte-for-byte against the system libxxhash.so.0.8.1
# (tests/test_checksum.py pins every length branch with vectors
# generated from that library).
_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e")

_PRIME_MX1 = 0x165667919E3779F9
_PRIME_MX2 = 0x9FB21C651E98DF25
_P32_1_64 = 0x9E3779B1
_P32_2_64 = 0x85EBCA77
_P32_3_64 = 0xC2B2AE3D


def _r64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 8], "little")


def _r32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & _M32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & _M64).to_bytes(8, "little"), "big")


def _aval64(h: int) -> int:
    h &= _M64
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def _aval3(h: int) -> int:
    h &= _M64
    h ^= h >> 37
    h = (h * _PRIME_MX1) & _M64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, n: int) -> int:
    h &= _M64
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * _PRIME_MX2) & _M64
    h ^= (h >> 35) + n
    h &= _M64
    h = (h * _PRIME_MX2) & _M64
    h ^= h >> 28
    return h


def _fold64(a: int, b: int) -> int:
    full = (a & _M64) * (b & _M64)
    return (full & _M64) ^ (full >> 64)


def _mix16(data: bytes, i: int, soff: int) -> int:
    lo = _r64(data, i) ^ _r64(_KSECRET, soff)
    hi = _r64(data, i + 8) ^ _r64(_KSECRET, soff + 8)
    return _fold64(lo, hi)


_ACC_INIT = (_P32_3_64, _P64_1, _P64_2, _P64_3,
             _P64_4, _P32_2_64, _P64_5, _P32_1_64)


def _xxh3_accumulate(data: bytes):
    """Long-input (>240B) accumulator pass shared by 64/128 finals."""
    acc = list(_ACC_INIT)
    n = len(data)
    stripes_per_block = (len(_KSECRET) - 64) // 8        # 16
    block_len = 64 * stripes_per_block                    # 1024

    def stripe(off: int, soff: int):
        for i in range(8):
            dv = _r64(data, off + 8 * i)
            dk = dv ^ _r64(_KSECRET, soff + 8 * i)
            acc[i ^ 1] = (acc[i ^ 1] + dv) & _M64
            acc[i] = (acc[i] + (dk & _M32) * (dk >> 32)) & _M64

    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            stripe(b * block_len + 64 * s, 8 * s)
        # scramble
        for i in range(8):
            a = acc[i]
            a ^= a >> 47
            a ^= _r64(_KSECRET, len(_KSECRET) - 64 + 8 * i)
            acc[i] = (a * _P32_1_64) & _M64
    off = nb_blocks * block_len
    nb_stripes = (n - 1 - off) // 64
    for s in range(nb_stripes):
        stripe(off + 64 * s, 8 * s)
    # last stripe: final 64 bytes
    stripe(n - 64, len(_KSECRET) - 64 - 7)
    return acc


def _merge_accs(acc, soff: int, start: int) -> int:
    result = start & _M64
    for i in range(4):
        result = (result + _fold64(
            acc[2 * i] ^ _r64(_KSECRET, soff + 16 * i),
            acc[2 * i + 1] ^ _r64(_KSECRET, soff + 16 * i + 8))) & _M64
    return _aval3(result)


def xxh3_64(data: bytes) -> int:
    n = len(data)
    if n == 0:
        return _aval64(_r64(_KSECRET, 56) ^ _r64(_KSECRET, 64))
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combined = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & _M32
        bitflip = (_r32(_KSECRET, 0) ^ _r32(_KSECRET, 4)) & _M32
        return _aval64(combined ^ bitflip)
    if n <= 8:
        in1 = _r32(data, 0)
        in2 = _r32(data, n - 4)
        bitflip = (_r64(_KSECRET, 8) ^ _r64(_KSECRET, 16)) & _M64
        keyed = (in2 + (in1 << 32)) ^ bitflip
        return _rrmxmx(keyed, n)
    if n <= 16:
        bf1 = (_r64(_KSECRET, 24) ^ _r64(_KSECRET, 32)) & _M64
        bf2 = (_r64(_KSECRET, 40) ^ _r64(_KSECRET, 48)) & _M64
        lo = _r64(data, 0) ^ bf1
        hi = _r64(data, n - 8) ^ bf2
        acc = (n + _swap64(lo) + hi + _fold64(lo, hi)) & _M64
        return _aval3(acc)
    if n <= 128:
        acc = (n * _P64_1) & _M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + _mix16(data, 48, 96)
                           + _mix16(data, n - 64, 112)) & _M64
                acc = (acc + _mix16(data, 32, 64)
                       + _mix16(data, n - 48, 80)) & _M64
            acc = (acc + _mix16(data, 16, 32)
                   + _mix16(data, n - 32, 48)) & _M64
        acc = (acc + _mix16(data, 0, 0)
               + _mix16(data, n - 16, 16)) & _M64
        return _aval3(acc)
    if n <= 240:
        acc = (n * _P64_1) & _M64
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, 16 * i)) & _M64
        acc = _aval3(acc)
        for i in range(8, n // 16):
            acc = (acc + _mix16(data, 16 * i, 16 * (i - 8) + 3)) & _M64
        acc = (acc + _mix16(data, n - 16, 136 - 17)) & _M64
        return _aval3(acc)
    accs = _xxh3_accumulate(data)
    return _merge_accs(accs, 11, (n * _P64_1) & _M64)


def xxh3_128(data: bytes) -> tuple[int, int]:
    """Returns (low64, high64)."""
    n = len(data)
    if n == 0:
        lo = _aval64(_r64(_KSECRET, 64) ^ _r64(_KSECRET, 72))
        hi = _aval64(_r64(_KSECRET, 80) ^ _r64(_KSECRET, 88))
        return lo, hi
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combl = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & _M32
        combh = _rotl32(_swap32(combl), 13)
        bfl = (_r32(_KSECRET, 0) ^ _r32(_KSECRET, 4)) & _M32
        bfh = (_r32(_KSECRET, 8) ^ _r32(_KSECRET, 12)) & _M32
        return _aval64(combl ^ bfl), _aval64(combh ^ bfh)
    if n <= 8:
        in_lo = _r32(data, 0)
        in_hi = _r32(data, n - 4)
        bitflip = (_r64(_KSECRET, 16) ^ _r64(_KSECRET, 24)) & _M64
        keyed = (in_lo + (in_hi << 32)) ^ bitflip
        full = keyed * ((_P64_1 + (n << 2)) & _M64)
        lo, hi = full & _M64, (full >> 64) & _M64
        hi = (hi + ((lo << 1) & _M64)) & _M64
        lo ^= hi >> 3
        lo ^= lo >> 35
        lo = (lo * _PRIME_MX2) & _M64
        lo ^= lo >> 28
        return lo, _aval3(hi)
    if n <= 16:
        bfl = (_r64(_KSECRET, 32) ^ _r64(_KSECRET, 40)) & _M64
        bfh = (_r64(_KSECRET, 48) ^ _r64(_KSECRET, 56)) & _M64
        in_lo = _r64(data, 0)
        in_hi = _r64(data, n - 8)
        full = (in_lo ^ in_hi ^ bfl) * _P64_1
        m_lo = full & _M64
        m_hi = (full >> 64) & _M64
        m_lo = (m_lo + (((n - 1) << 54) & _M64)) & _M64
        in_hi ^= bfh
        m_hi = (m_hi + in_hi +
                (in_hi & _M32) * (_P32_2_64 - 1)) & _M64
        m_lo ^= _swap64(m_hi)
        full2 = m_lo * _P64_2
        h_lo = full2 & _M64
        h_hi = ((full2 >> 64) + m_hi * _P64_2) & _M64
        return _aval3(h_lo), _aval3(h_hi)

    def mix32(acc, i1: int, i2: int, soff: int):
        lo, hi = acc
        lo = (lo + _mix16(data, i1, soff)) & _M64
        lo ^= (_r64(data, i2) + _r64(data, i2 + 8)) & _M64
        hi = (hi + _mix16(data, i2, soff + 16)) & _M64
        hi ^= (_r64(data, i1) + _r64(data, i1 + 8)) & _M64
        return [lo, hi]

    def finalize(acc):
        lo = (acc[0] + acc[1]) & _M64
        hi = (acc[0] * _P64_1 + acc[1] * _P64_4 + n * _P64_2) & _M64
        return _aval3(lo), (0 - _aval3(hi)) & _M64

    if n <= 128:
        acc = [(n * _P64_1) & _M64, 0]
        i = (n - 1) // 32
        while i >= 0:
            acc = mix32(acc, 16 * i, n - 16 * (i + 1), 32 * i)
            i -= 1
        return finalize(acc)
    if n <= 240:
        acc = [(n * _P64_1) & _M64, 0]
        for i in range(4):
            acc = mix32(acc, 32 * i, 32 * i + 16, 32 * i)
        acc = [_aval3(acc[0]), _aval3(acc[1])]
        for i in range(4, n // 32):
            acc = mix32(acc, 32 * i, 32 * i + 16, 3 + 32 * (i - 4))
        # last 32 bytes, inputs swapped, secret at SIZE_MIN-LASTOFFSET-16
        acc = mix32(acc, n - 16, n - 32, 136 - 17 - 16)
        return finalize(acc)
    accs = _xxh3_accumulate(data)
    lo = _merge_accs(accs, 11, (n * _P64_1) & _M64)
    hi = _merge_accs(accs, len(_KSECRET) - 64 - 11,
                     (~(n * _P64_2)) & _M64)
    return lo, hi


def xxhash(value: str, variant: str = "XXH32", seed: int = 0) -> int:
    """xxhash.rs: integer digest; default variant XXH32. 64-bit
    results wrap into i64 like all VRL integers; XXH3-128 returns the
    decimal string of the u128 (xxhash.rs renders it to_string)."""
    from ..value import wrap_i64
    if variant in ("XXH32", "32"):
        return xxh32(_b(value), seed)
    if variant in ("XXH64", "64"):
        return wrap_i64(xxh64(_b(value), seed))
    if variant == "XXH3-64":
        return wrap_i64(xxh3_64(_b(value)))
    if variant == "XXH3-128":
        lo, hi = xxh3_128(_b(value))
        return str((hi << 64) | lo)
    raise VrlError(
        "Variant must be either 'XXH32', 'XXH64', 'XXH3-64', or 'XXH3-128'")


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
