"""IP/network scalar utilities — capability parity with the reference's
helpers (/root/reference/parser/parser.go:62-75 NormalizeIP,
etl/globals.go:200-233 ip→int and bit distance, etl/globals.go:186-198 IATA
site-code extraction)."""

from __future__ import annotations

import ipaddress
import re
from typing import Optional

_IATA_RE = re.compile(r"-([a-z]{3})[0-9ct]{2,4}")  # e.g. mlab1-lga05


def normalize_ip(ip: str) -> str:
    """Fix malformed IPv6 (``:::`` runs), unmap IPv4-mapped-IPv6, and
    canonicalize. Returns the input unchanged when unparseable (callers
    filter separately, as the reference's row-validity checks do)."""
    if not ip:
        return ip
    fixed = re.sub(r":{3,}", "::", ip)
    try:
        addr = ipaddress.ip_address(fixed)
    except ValueError:
        return ip
    if isinstance(addr, ipaddress.IPv6Address) and addr.ipv4_mapped:
        return str(addr.ipv4_mapped)
    return str(addr)


def is_valid_ip(ip: Optional[str]) -> bool:
    if not ip:
        return False
    try:
        ipaddress.ip_address(ip)
        return True
    except ValueError:
        return False


def ip_to_int(ip: str) -> int:
    """IPv4 → 32-bit int; IPv6 → upper 64 bits (reference
    GetIntFromIPv4 / GetIntFromIPv6Upper)."""
    addr = ipaddress.ip_address(ip)
    if isinstance(addr, ipaddress.IPv4Address):
        return int(addr)
    return int(addr) >> 64


def number_bits_different(ip1: str, ip2: str) -> int:
    """Hamming distance between two addresses' int forms (same family)."""
    return bin(ip_to_int(ip1) ^ ip_to_int(ip2)).count("1")


def get_iata_code(hostname: str, default: str = "") -> str:
    """Three-letter site code from an M-Lab-style hostname
    (reference etl/globals.go:186-198)."""
    m = _IATA_RE.search(hostname.lower())
    return m.group(1) if m else default
