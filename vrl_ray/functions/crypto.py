"""Symmetric encryption stdlib: encrypt / decrypt cipher suites and
ipcrypt IP-address encryption.

Reference files: encrypt.rs:126-180 (suite dispatch), decrypt.rs,
encrypt_ip.rs / decrypt_ip.rs (ipcrypt-deterministic "aes128" and
ipcrypt-pfx "pfx" modes, https://datatracker.ietf.org/doc/draft-denis-ipcrypt/).

Implemented with the `cryptography` package; suites whose primitives
aren't available (XChaCha20/XSalsa20, AES-SIV) raise a clear VrlError.
"""

from __future__ import annotations

import ipaddress
import os
import struct
from typing import Optional

from ..value import VrlError

__all__ = ["encrypt", "decrypt", "encrypt_ip", "decrypt_ip"]


def _b(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-8")
    raise VrlError(f"expected bytes/string, got {type(v).__name__}")


def _aes_cls(keylen: int):
    from cryptography.hazmat.primitives.ciphers import algorithms

    return algorithms.AES


def _check_key(key: bytes, bits: int):
    if len(key) * 8 != bits:
        raise VrlError(f"invalid key size: expected {bits // 8} bytes, "
                       f"got {len(key)}")


def _check_iv(iv: bytes, n: int):
    if len(iv) != n:
        raise VrlError(f"invalid iv size: expected {n} bytes, got {len(iv)}")


def _parse_algorithm(algorithm: str):
    parts = algorithm.upper().split("-")
    if parts[0] != "AES" or len(parts) < 3:
        return None
    bits = int(parts[1])
    mode = "-".join(parts[2:])
    return bits, mode


# --- CTR keystreams (reference uses Ctr128LE by default, Ctr64BE for
# the -BE suites: encrypt.rs:138-149) ---

def _ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(block) + enc.finalize()


def _ctr_keystream(key: bytes, iv: bytes, n: int, endian: str) -> bytes:
    out = bytearray()
    if endian == "le":
        counter = int.from_bytes(iv, "little")
        nblocks = (n + 15) // 16
        for i in range(nblocks):
            blk = ((counter + i) % (1 << 128)).to_bytes(16, "little")
            out += _ecb_encrypt_block(key, blk)
    else:  # 64-bit BE counter in the last 8 bytes
        prefix = iv[:8]
        counter = int.from_bytes(iv[8:], "big")
        nblocks = (n + 15) // 16
        for i in range(nblocks):
            blk = prefix + ((counter + i) % (1 << 64)).to_bytes(8, "big")
            out += _ecb_encrypt_block(key, blk)
    return bytes(out[:n])


# --- CBC paddings (encrypt.rs:150-161) ---

def _pad(data: bytes, scheme: str) -> bytes:
    n = 16 - (len(data) % 16)
    if scheme == "PKCS7":
        return data + bytes([n]) * n
    if scheme == "ANSIX923":
        return data + bytes(n - 1) + bytes([n])
    if scheme == "ISO7816":
        return data + b"\x80" + bytes(n - 1)
    if scheme == "ISO10126":
        # the RustCrypto block-padding crate pads Iso10126 with Pkcs7
        # bytes "for simplicity" — reference output is byte-identical
        # to PKCS7 (encrypt.rs test vectors 420 vs 474)
        return data + bytes([n]) * n
    raise VrlError(f"unsupported padding {scheme}")


def _unpad(data: bytes, scheme: str) -> bytes:
    if not data or len(data) % 16:
        raise VrlError("invalid ciphertext length")
    if scheme in ("PKCS7", "ANSIX923", "ISO10126"):
        n = data[-1]
        if not (1 <= n <= 16) or n > len(data):
            raise VrlError("invalid padding")
        if scheme == "PKCS7" and data[-n:] != bytes([n]) * n:
            raise VrlError("invalid padding")
        if scheme == "ANSIX923" and any(data[-n:-1]):
            raise VrlError("invalid padding")
        return data[:-n]
    if scheme == "ISO7816":
        i = len(data) - 1
        while i >= 0 and data[i] == 0:
            i -= 1
        if i < 0 or data[i] != 0x80:
            raise VrlError("invalid padding")
        return data[:i]
    raise VrlError(f"unsupported padding {scheme}")


def _cbc(key: bytes, iv: bytes, data: bytes, encrypt_op: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt_op else c.decryptor()
    return op.update(data) + op.finalize()


def _stream_mode(key: bytes, iv: bytes, data: bytes, mode: str,
                 encrypt_op: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    if mode == "CFB":
        c = Cipher(algorithms.AES(key), modes.CFB(iv))
    elif mode == "OFB":
        c = Cipher(algorithms.AES(key), modes.OFB(iv))
    else:
        raise VrlError(f"unsupported mode {mode}")
    op = c.encryptor() if encrypt_op else c.decryptor()
    return op.update(data) + op.finalize()


# --- pure-Python ChaCha/Salsa cores for the X-variants --------------------
# (cryptography exposes neither HChaCha20 nor Salsa20; these run once
# per call on payload-sized data — conformance-grade, not a hot path)

_M32 = 0xFFFFFFFF


def _rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (32 - n))) & _M32


_SIGMA = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)  # "expand 32-byte k"


def _chacha_rounds(s: list) -> list:
    def qr(a, b, c, d):
        s[a] = (s[a] + s[b]) & _M32
        s[d] = _rotl(s[d] ^ s[a], 16)
        s[c] = (s[c] + s[d]) & _M32
        s[b] = _rotl(s[b] ^ s[c], 12)
        s[a] = (s[a] + s[b]) & _M32
        s[d] = _rotl(s[d] ^ s[a], 8)
        s[c] = (s[c] + s[d]) & _M32
        s[b] = _rotl(s[b] ^ s[c], 7)

    for _ in range(10):
        qr(0, 4, 8, 12)
        qr(1, 5, 9, 13)
        qr(2, 6, 10, 14)
        qr(3, 7, 11, 15)
        qr(0, 5, 10, 15)
        qr(1, 6, 11, 12)
        qr(2, 7, 8, 13)
        qr(3, 4, 9, 14)
    return s


def _hchacha20(key: bytes, nonce16: bytes) -> bytes:
    import struct
    s = list(_SIGMA) + list(struct.unpack("<8L", key)) \
        + list(struct.unpack("<4L", nonce16))
    s = _chacha_rounds(s)
    return struct.pack("<8L", *(s[i] for i in (0, 1, 2, 3, 12, 13, 14, 15)))


def _salsa_rounds(s: list) -> list:
    def qr(a, b, c, d):
        s[b] ^= _rotl((s[a] + s[d]) & _M32, 7)
        s[c] ^= _rotl((s[b] + s[a]) & _M32, 9)
        s[d] ^= _rotl((s[c] + s[b]) & _M32, 13)
        s[a] ^= _rotl((s[d] + s[c]) & _M32, 18)

    for _ in range(10):
        qr(0, 4, 8, 12)
        qr(5, 9, 13, 1)
        qr(10, 14, 2, 6)
        qr(15, 3, 7, 11)
        qr(0, 1, 2, 3)
        qr(5, 6, 7, 4)
        qr(10, 11, 8, 9)
        qr(15, 12, 13, 14)
    return s


def _salsa_state(key: bytes, n16: bytes) -> list:
    import struct
    k = struct.unpack("<8L", key)
    n = struct.unpack("<4L", n16)
    return [_SIGMA[0], k[0], k[1], k[2], k[3], _SIGMA[1], n[0], n[1],
            n[2], n[3], _SIGMA[2], k[4], k[5], k[6], k[7], _SIGMA[3]]


def _hsalsa20(key: bytes, nonce16: bytes) -> bytes:
    import struct
    s = _salsa_rounds(_salsa_state(key, nonce16))
    return struct.pack("<8L", *(s[i] for i in (0, 5, 10, 15, 6, 7, 8, 9)))


def _salsa20_block(key: bytes, nonce8: bytes, counter: int) -> bytes:
    import struct
    init = _salsa_state(key, nonce8 + struct.pack("<Q", counter))
    s = _salsa_rounds(list(init))
    return struct.pack("<16L", *((a + b) & _M32 for a, b in zip(s, init)))


def _salsa20_xor(key: bytes, nonce8: bytes, data: bytes,
                 skip: int = 0) -> bytes:
    """XOR data with the Salsa20 keystream starting at byte `skip`
    (secretbox consumes block 0's first 32 bytes as the Poly1305
    key)."""
    out = bytearray()
    pos = skip
    i = 0
    while i < len(data):
        block = _salsa20_block(key, nonce8, pos // 64)
        off = pos % 64
        take = min(64 - off, len(data) - i)
        out += bytes(d ^ k for d, k in
                     zip(data[i:i + take], block[off:off + take]))
        i += take
        pos += take
    return bytes(out)


def _run_suite(algorithm: str, data: bytes, key: bytes, iv: bytes,
               encrypt_op: bool) -> bytes:
    alg = algorithm.upper()
    if alg == "CHACHA20-POLY1305":
        from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305

        _check_key(key, 256)
        _check_iv(iv, 12)
        c = ChaCha20Poly1305(key)
        try:
            return (c.encrypt(iv, data, None) if encrypt_op
                    else c.decrypt(iv, data, None))
        except Exception as e:
            raise VrlError(f"decryption failed: {e}") from e
    if alg in ("AES-128-SIV", "AES-256-SIV"):
        from cryptography.hazmat.primitives.ciphers.aead import AESSIV

        # RustCrypto aes-siv names by the SUBKEY width: Aes128Siv
        # takes a 32-byte key, Aes256Siv a 64-byte one; its Aead impl
        # feeds S2V the headers [aad, nonce] — with no aad that is
        # [b"", iv] (encrypt.rs:162-163, vector-verified). Output =
        # SIV tag (16) || ciphertext.
        _check_key(key, 256 if alg == "AES-128-SIV" else 512)
        _check_iv(iv, 16)
        c = AESSIV(key)
        try:
            return (c.encrypt(data, [b"", iv]) if encrypt_op
                    else c.decrypt(data, [b"", iv]))
        except Exception as e:
            raise VrlError(f"decryption failed: {e}") from e
    if alg == "XCHACHA20-POLY1305":
        from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305

        # draft-irtf-cfrg-xchacha: subkey = HChaCha20(key, nonce[:16]),
        # then IETF ChaCha20-Poly1305 with nonce 0x00000000||nonce[16:]
        _check_key(key, 256)
        _check_iv(iv, 24)
        sub = _hchacha20(key, iv[:16])
        c = ChaCha20Poly1305(sub)
        try:
            return (c.encrypt(b"\x00" * 4 + iv[16:], data, None)
                    if encrypt_op
                    else c.decrypt(b"\x00" * 4 + iv[16:], data, None))
        except Exception as e:
            raise VrlError(f"decryption failed: {e}") from e
    if alg == "XSALSA20-POLY1305":
        # NaCl secretbox (crypto_secretbox crate, encrypt.rs:170):
        # subkey = HSalsa20(key, nonce[:16]); keystream block 0's first
        # 32 bytes key Poly1305; AEAD layout = ciphertext || tag
        _check_key(key, 256)
        _check_iv(iv, 24)
        from cryptography.hazmat.primitives.poly1305 import Poly1305

        sub = _hsalsa20(key, iv[:16])
        block0 = _salsa20_block(sub, iv[16:], 0)
        polykey = block0[:32]
        # NaCl layout: tag (16) FIRST, then ciphertext
        if encrypt_op:
            ct = _salsa20_xor(sub, iv[16:], data, skip=32)
            tag = Poly1305.generate_tag(polykey, ct)
            return tag + ct
        if len(data) < 16:
            raise VrlError("decryption failed: ciphertext too short")
        tag, ct = data[:16], data[16:]
        try:
            Poly1305.verify_tag(polykey, ct, tag)
        except Exception as e:
            raise VrlError("decryption failed: aead::Error") from e
        return _salsa20_xor(sub, iv[16:], ct, skip=32)

    parsed = _parse_algorithm(alg)
    if parsed is None:
        raise VrlError(f"invalid algorithm: {algorithm}")
    bits, mode = parsed
    if bits not in (128, 192, 256):
        raise VrlError(f"invalid algorithm: {algorithm}")
    _check_key(key, bits)

    if mode in ("CFB", "OFB"):
        _check_iv(iv, 16)
        return _stream_mode(key, iv, data, mode, encrypt_op)
    if mode in ("CTR", "CTR-LE"):
        _check_iv(iv, 16)
        ks = _ctr_keystream(key, iv, len(data), "le")
        return bytes(a ^ b for a, b in zip(data, ks))
    if mode == "CTR-BE":
        _check_iv(iv, 16)
        ks = _ctr_keystream(key, iv, len(data), "be")
        return bytes(a ^ b for a, b in zip(data, ks))
    if mode.startswith("CBC-"):
        scheme = mode[4:]
        _check_iv(iv, 16)
        if encrypt_op:
            return _cbc(key, iv, _pad(data, scheme), True)
        return _unpad(_cbc(key, iv, data, False), scheme)
    raise VrlError(f"invalid algorithm: {algorithm}")


def encrypt(plaintext, algorithm: str, key, iv=b"") -> bytes:
    """encrypt.rs:126-180."""
    return _run_suite(algorithm, _b(plaintext), _b(key), _b(iv), True)


def decrypt(ciphertext, algorithm: str, key, iv=b"") -> bytes:
    out = _run_suite(algorithm, _b(ciphertext), _b(key), _b(iv), False)
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out


# ---------------------------------------------------------------------------
# encrypt_ip / decrypt_ip — ipcrypt (encrypt_ip.rs / decrypt_ip.rs)

def _parse_ip(ip: str):
    # encrypt_ip.rs/decrypt_ip.rs parse the IP FIRST (std AddrParseError
    # Display text), before mode/key validation
    try:
        return ipaddress.ip_address(ip)
    except ValueError as e:
        raise VrlError(
            "unable to parse IP address: invalid IP address syntax") from e


def _ip16(ip: str) -> bytes:
    a = _parse_ip(ip) if isinstance(ip, str) else ip
    if a.version == 4:
        return b"\x00" * 10 + b"\xff\xff" + a.packed
    return a.packed


def _from_ip16(b16: bytes) -> str:
    if b16[:12] == b"\x00" * 10 + b"\xff\xff":
        return str(ipaddress.IPv4Address(b16[12:]))
    return str(ipaddress.IPv6Address(b16))


def _ipcrypt_pfx_bit(k1: bytes, k2: bytes, padded: bytes) -> int:
    e1 = _ecb_encrypt_block(k1, padded)
    e2 = _ecb_encrypt_block(k2, padded)
    return (e1[15] ^ e2[15]) & 1


def _ipcrypt_pfx(key: bytes, ip: str, encrypt_op: bool) -> str:
    """ipcrypt-pfx: prefix-preserving encryption (draft-denis-ipcrypt).

    Walks bits MSB→LSB; each output bit = input bit XOR a PRF bit
    derived from the already-processed (plaintext) prefix. Decryption
    reconstructs the plaintext prefix incrementally."""
    if len(key) != 32:
        raise VrlError("pfx mode requires a 32-byte key")
    k1, k2 = key[:16], key[16:]
    if k1 == k2:
        raise VrlError("the two halves of the key must differ")
    src = _ip16(ip)
    is_v4 = src[:12] == b"\x00" * 10 + b"\xff\xff"
    start = 96 if is_v4 else 0

    src_bits = [(src[i // 8] >> (7 - i % 8)) & 1 for i in range(128)]
    out_bits = list(src_bits)

    # padded_prefix for a prefix of length n: bits [separator 1][prefix]
    # right-aligned in 128 bits (LSB = most recent bit).
    def padded(prefix_bits: list) -> bytes:
        n = 0
        for b in prefix_bits:
            n = (n << 1) | b
        n |= 1 << len(prefix_bits)
        return n.to_bytes(16, "big")

    if encrypt_op:
        prefix = src_bits[:start]
        for i in range(start, 128):
            cb = _ipcrypt_pfx_bit(k1, k2, padded(prefix))
            out_bits[i] = src_bits[i] ^ cb
            prefix.append(src_bits[i])
    else:
        prefix = src_bits[:start]
        for i in range(start, 128):
            cb = _ipcrypt_pfx_bit(k1, k2, padded(prefix))
            out_bits[i] = src_bits[i] ^ cb
            prefix.append(out_bits[i])

    out = bytearray(16)
    for i, b in enumerate(out_bits):
        if b:
            out[i // 8] |= 1 << (7 - i % 8)
    if is_v4:
        out[:12] = b"\x00" * 10 + b"\xff\xff"
        return str(ipaddress.IPv4Address(bytes(out[12:])))
    return str(ipaddress.IPv6Address(bytes(out)))


def _key_sized(key: bytes, n: int, mode: str, ver: str) -> bytes:
    if len(key) != n:
        raise VrlError(f"{mode} mode requires a {n}-byte key for {ver}")
    return key


def encrypt_ip(ip: str, key, mode: str = "aes128") -> str:
    key = _b(key)
    a = _parse_ip(ip)
    ver = "IPv4" if a.version == 4 else "IPv6"
    if mode == "aes128":
        _key_sized(key, 16, "aes128", ver)
        enc = _ecb_encrypt_block(key, _ip16(a))
        return str(ipaddress.IPv6Address(enc))
    if mode == "pfx":
        _key_sized(key, 32, "pfx", ver)
        return _ipcrypt_pfx(key, ip, True)
    raise VrlError(f"Invalid mode '{mode}'. Must be 'aes128' or 'pfx'")


def decrypt_ip(ip: str, key, mode: str = "aes128") -> str:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    key = _b(key)
    a = _parse_ip(ip)
    ver = "IPv4" if a.version == 4 else "IPv6"
    if mode == "aes128":
        _key_sized(key, 16, "aes128", ver)
        blk = a.packed if a.version == 6 else _ip16(a)
        dec = Cipher(algorithms.AES(key), modes.ECB()).decryptor()
        return _from_ip16(dec.update(blk) + dec.finalize())
    if mode == "pfx":
        _key_sized(key, 32, "pfx", ver)
        return _ipcrypt_pfx(key, ip, False)
    raise VrlError(f"Invalid mode '{mode}'. Must be 'aes128' or 'pfx'")
