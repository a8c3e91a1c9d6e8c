"""IP extraction and CIDR lookup helpers.

Re-implements the *semantics* of the reference extractors — Parse_IP
(/root/reference/src/parsers/ip.c:88-971: scan the message, find the Nth
IPv4/IPv6 plus an adjacent port) and IP2Bit/is_inrange
(/root/reference/src/util.c:307,560) — with a single compiled-regex pass
per message instead of the reference's char-strip + tokenize loop.

Port attachment styles recognized (ip.c:37-60 shapes): ``1.2.3.4:22``,
``1.2.3.4#22``, ``[fe80::1]:80``, ``1.2.3.4 port 1234``.
"""

from __future__ import annotations

import bisect
import ipaddress
import re

MAX_PARSE_IP = 30  # reference src/sagan-defs.h MAX_PARSE_IP

_V4MAPPED_BASE = int(ipaddress.IPv6Address("::ffff:0:0"))

# candidate tokens; validity is checked with the ipaddress module
_IP_CAND = re.compile(
    r"""
    \[(?P<v6b>[0-9A-Fa-f:.]{2,45})\](?::(?P<v6bport>\d{1,5}))?  # [v6]:port
  | (?<![\w.:])(?P<v4>(?:\d{1,3}\.){3}\d{1,3})(?![\w.])          # bare v4
    # bare v6, optionally with an embedded dotted-quad tail
    # (::ffff:1.2.3.4, 64:ff9b::192.0.2.33 — parsers/ip.c handles these
    # via inet_pton(AF_INET6))
  | (?<![\w.:])(?P<v6>[0-9A-Fa-f]{0,4}(?::[0-9A-Fa-f]{0,4}){2,7}
                (?:(?:\.\d{1,3}){3})?)(?![\w:.])
    """,
    re.VERBOSE,
)

_PORT_AFTER = re.compile(r"(?:[:#](\d{1,5})|\s+port\s+(\d{1,5}))")


def is_valid_ip(s: str) -> bool:
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


def ip_to_int(ip: str) -> int:
    """IPv6-width integer form (reference IP2Bit 16-byte binary,
    util.c:307). IPv4 is v4-mapped into v6 space so one ordering covers
    both families."""
    a = ipaddress.ip_address(ip)
    if a.version == 4:
        return _V4MAPPED_BASE + int(a)
    return int(a)


def extract_ips(text: str, max_ips: int = MAX_PARSE_IP) -> list[tuple[str, int]]:
    """Return up to ``max_ips`` (ip, port) pairs in order of appearance.
    Port 0 = none found. Mirrors the positional cache the reference engine
    consumes via ``parse_src_ip: N`` (engine.c:800-843)."""
    out: list[tuple[str, int]] = []
    for m in _IP_CAND.finditer(text):
        if len(out) >= max_ips:
            break
        port = 0
        if m.group("v6b"):
            cand = m.group("v6b")
            if not is_valid_ip(cand):
                continue
            if m.group("v6bport"):
                port = int(m.group("v6bport"))
        elif m.group("v4"):
            cand = m.group("v4")
            # fast octet validation (the regex already guarantees shape);
            # leading-zero octets are rejected like inet_pton/ipaddress
            # do — '10.0.0.01' must not be emitted as an IP that
            # ip_to_int then cannot parse
            if any(int(o) > 255 or (len(o) > 1 and o[0] == "0")
                   for o in cand.split(".")):
                continue
            pm = _PORT_AFTER.match(text, m.end())
            if pm:
                port = int(pm.group(1) or pm.group(2))
        else:
            cand = m.group("v6")
            # require ≥2 colons and at least one hex digit ("::", the
            # unspecified address, is not a parseable endpoint — the
            # reference's zero-IP invalidity, util.c is_notlocalhost)
            if (cand.count(":") < 2 or not any(c in "0123456789abcdefABCDEF" for c in cand)
                    or not is_valid_ip(cand)):
                continue
            pm = _PORT_AFTER.match(text, m.end())
            # bare v6 followed by ':port' is ambiguous; accept '#' and 'port N'
            if pm and (pm.group(2) or text[m.end()] == "#"):
                port = int(pm.group(1) or pm.group(2))
        if port > 65535:
            port = 0
        out.append((cand, port))
    return out


class CidrTable:
    """Sorted disjoint CIDR ranges → value, with bisect lookup.

    The broadcast analog of the reference's GeoIP mmdb / blacklist array
    (src/geoip.c:58-86, src/processors/blacklist.c:70-229): built once on
    the driver, shipped to workers via ``ray.put``, looked up per unique IP
    per batch with memoization.
    """

    def __init__(self, entries: list[tuple[str, str]]):
        """entries: [(cidr, value)]; ranges must be disjoint."""
        rows = []
        for cidr, value in entries:
            n = ipaddress.ip_network(cidr, strict=False)
            if n.version == 4:
                lo = _V4MAPPED_BASE + int(n.network_address)
                hi = _V4MAPPED_BASE + int(n.broadcast_address)
            else:
                lo, hi = int(n.network_address), int(n.broadcast_address)
            rows.append((lo, hi, value))
        rows.sort()
        self._los = [r[0] for r in rows]
        self._his = [r[1] for r in rows]
        self._vals = [r[2] for r in rows]

    def lookup(self, ip: str) -> str | None:
        try:
            v = ip_to_int(ip)
        except ValueError:
            return None
        i = bisect.bisect_right(self._los, v) - 1
        if i >= 0 and v <= self._his[i]:
            return self._vals[i]
        return None

    def __contains__(self, ip: str) -> bool:
        return self.lookup(ip) is not None

    def __len__(self) -> int:
        return len(self._los)


def net_group_contains(nets: list[tuple[int, int, bool]], ip: str) -> bool:
    """Snort-style group membership with negation (reference
    src/flow.c:48-504): an IP matches the group if it is inside any
    non-negated range and outside every negated range; a group of only
    negated ranges matches when the IP avoids them all."""
    try:
        v = ip_to_int(ip)
    except ValueError:
        return False
    any_positive = False
    pos_hit = False
    for lo, hi, neg in nets:
        inside = lo <= v <= hi
        if neg:
            if inside:
                return False
        else:
            any_positive = True
            if inside:
                pos_hit = True
    return pos_hit if any_positive else True
