"""IP-category stdlib functions (always-on group in the reference).

Mirrors /root/reference/src/stdlib/{ip_aton,ip_ntoa,ip_cidr_contains,
ip_subnet,ip_to_ipv6,ipv6_to_ipv4,is_ipv4,is_ipv6,ip_pton,ip_ntop}.rs
via the Python ``ipaddress`` stdlib module.
"""

from __future__ import annotations

import ipaddress
import socket
import struct

from ..value import VrlError

__all__ = [
    "ip_aton", "ip_ntoa", "ip_cidr_contains", "ip_subnet",
    "ip_to_ipv6", "ipv6_to_ipv4", "is_ipv4", "is_ipv6",
    "ip_pton", "ip_ntop",
]


def _ip(value: str):
    # Rust AddrParseError Display is the fixed text "invalid IP
    # address syntax" (ip_pton.rs / ip_to_ipv6.rs / ipv6_to_ipv4.rs
    # interpolate it verbatim)
    try:
        return ipaddress.ip_address(value)
    except ValueError as e:
        raise VrlError(
            "unable to parse IP address: invalid IP address syntax") from e


def ip_aton(value: str) -> int:
    """ip_aton.rs: dotted-quad IPv4 -> integer (Ipv4Addr::from_str —
    a v6 input fails the same way as garbage)."""
    try:
        ip = ipaddress.IPv4Address(value)
    except ValueError as e:
        raise VrlError(
            "unable to parse IPv4 address: invalid IPv4 address syntax"
        ) from e
    return int(ip)


def ip_ntoa(value: int) -> str:
    if isinstance(value, bool) or not isinstance(value, int) or not (0 <= value <= 0xFFFFFFFF):
        raise VrlError("cannot convert to bytes: integer does not fit in u32")
    return str(ipaddress.IPv4Address(value))


def ip_cidr_contains(cidr, value: str) -> bool:
    """ip_cidr_contains.rs: cidr may be a string or array of strings."""
    ip = _ip(value)
    cidrs = cidr if isinstance(cidr, list) else [cidr]
    for c in cidrs:
        try:
            net = ipaddress.ip_network(c, strict=False)
        except ValueError as e:
            raise VrlError(f"unable to parse CIDR: {e}") from e
        if ip.version == net.version and ip in net:
            return True
    return False


def ip_subnet(value: str, subnet: str) -> str:
    """ip_subnet.rs: mask an IP by `/nn` prefix or dotted netmask."""
    ip = _ip(value)
    if subnet.startswith("/"):
        try:
            bits = int(subnet[1:])
            net = ipaddress.ip_network(f"{ip}/{bits}", strict=False)
        except ValueError as e:
            raise VrlError(f"unable to parse subnet: {e}") from e
        return str(net.network_address)
    try:
        mask = ipaddress.ip_address(subnet)
    except ValueError as e:
        raise VrlError(f"unable to parse subnet: {e}") from e
    masked = int(ip) & int(mask)
    return str(ipaddress.ip_address(masked))


def ip_to_ipv6(value: str) -> str:
    """ip_to_ipv6.rs: v4 -> ::ffff:a.b.c.d mapped form; v6 unchanged."""
    ip = _ip(value)
    if ip.version == 6:
        return str(ip)
    return f"::ffff:{ip}"


def ipv6_to_ipv4(value: str) -> str:
    """ipv6_to_ipv4.rs: mapped v6 -> v4; errors when not mappable."""
    ip = _ip(value)
    if ip.version == 4:
        return str(ip)
    v4 = ip.ipv4_mapped
    if v4 is None:
        # ipv6_to_ipv4.rs interpolates the PARSED Ipv6Addr (canonical
        # Display form), not the input text
        raise VrlError(f"IPV6 address {ip} is not compatible with IPV4")
    return str(v4)


def is_ipv4(value) -> bool:
    # is_ipv4.rs: try_bytes_utf8_lossy ERRORS on non-string input
    # (unlike the other is_* predicates, which type-test)
    if not isinstance(value, str):
        from ..value import vrl_type
        raise VrlError(f"expected string, got {vrl_type(value)}")
    try:
        return ipaddress.ip_address(value).version == 4
    except ValueError:
        return False


def is_ipv6(value) -> bool:
    if not isinstance(value, str):
        from ..value import vrl_type
        raise VrlError(f"expected string, got {vrl_type(value)}")
    try:
        return ipaddress.ip_address(value).version == 6
    except ValueError:
        return False


def ip_pton(value: str) -> bytes:
    """ip_pton.rs: printable -> packed bytes."""
    ip = _ip(value)
    return ip.packed


def ip_ntop(value: bytes) -> str:
    """ip_ntop.rs: packed 4/16 bytes -> printable."""
    raw = value if isinstance(value, bytes) else value.encode("latin-1")
    if len(raw) == 4:
        return socket.inet_ntop(socket.AF_INET, raw)
    if len(raw) == 16:
        return socket.inet_ntop(socket.AF_INET6, raw)
    raise VrlError('"value" must be of length 4 or 16 bytes')
