"""Normalization stage — the liblognorm analog.

The reference hands each message to liblognorm and copies the normalized
fields (src-ip / dst-ip / src-port / dst-port / username / proto) into the
record when a rule carries the ``normalize`` option
(/root/reference/src/liblognormalize.c:105-264, rule parse
src/rules.c:2764-2766, consumption src/processors/engine.c:739-747 and
the "was it normalized?" fallbacks at engine.c:902-916).

Here the rulebase is a compiled table of liblognorm-v1-style samples::

    rule=: %eid:number%: auth failure for %username:word% from %src-ip:ipv4%:%src-port:number%

Supported field types (a practical subset of liblognorm's parser set):
``number``, ``word`` (non-space run), ``ipv4``, ``char-to:<c>`` (up to the
next literal ``<c>``), ``rest`` (to end of message). A sample must match
the WHOLE message (liblognorm sample semantics); the first matching sample
wins. IP-valued fields are validated and dropped when not parseable — the
``Is_IP`` guard at liblognormalize.c:137-151.

Scoping deviation (documented): the reference normalizes a record once
when the *first* ``normalize`` rule reaches it and the extracted fields
then persist for every later rule of that record (engine.c:739 caches
``liblognorm_status``). We scope normalization per rule — every
``normalize`` rule sees the normalized fields, rules without the option
never do — which is order-independent and therefore deterministic under
batch evaluation. Both the oracle evaluator and the vectorized classifier
implement this same scoping.
"""

from __future__ import annotations

import ipaddress
import re

_TYPE_RES = {
    "number": r"\d+",
    "word": r"\S+",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "rest": r".*",
}

_FIELD_RE = re.compile(r"%([A-Za-z0-9_.-]+):([a-z0-9-]+)(?::(.))?%")

# normalized-key → transcript-record field (liblognormalize.c:125-264)
FIELD_MAP = {
    "src-ip": "src_ip",
    "dst-ip": "dst_ip",
    "src-port": "src_port",
    "dst-port": "dst_port",
    "username": "username",
    "proto": "proto",
}


class NormalizeError(ValueError):
    pass


def _compile_sample(sample: str) -> tuple[re.Pattern, list[str]]:
    """Translate one sample body (the part after ``rule=...:``) into an
    anchored regex with groups g0, g1, ... plus the field-name list
    (kept aside because liblognorm names like ``src-ip`` aren't valid
    python group names)."""
    out = []
    fields: list[str] = []
    pos = 0
    for m in _FIELD_RE.finditer(sample):
        out.append(re.escape(sample[pos:m.start()]))
        name, ftype, arg = m.group(1), m.group(2), m.group(3)
        if ftype == "char-to":
            if not arg:
                raise NormalizeError(f"char-to needs a delimiter: {sample!r}")
            body = f"[^{re.escape(arg)}]*"
        else:
            body = _TYPE_RES.get(ftype)
            if body is None:
                raise NormalizeError(f"unknown field type {ftype!r} in {sample!r}")
        out.append(f"(?P<g{len(fields)}>{body})")
        fields.append(name)
        pos = m.end()
    out.append(re.escape(sample[pos:]))
    return re.compile("^(?:" + "".join(out) + ")$"), fields


def _valid_ip(s: str) -> bool:
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


class NormalizeTable:
    """Ordered compiled rulebase; first fully-matching sample wins."""

    def __init__(self, samples: list[str]):
        self.patterns = [_compile_sample(s) for s in samples]

    def apply(self, text: str) -> dict[str, str]:
        """Normalized record fields for one message ({} when no sample
        matches). Keys are the FIELD_MAP targets (src_ip, username, ...)."""
        for rx, fields in self.patterns:
            m = rx.match(text)
            if m is None:
                continue
            out: dict[str, str] = {}
            for i, name in enumerate(fields):
                fld = FIELD_MAP.get(name)
                if fld is None:
                    continue            # tag-only fields (eid, status, ...)
                v = m.group(f"g{i}")
                if fld in ("src_ip", "dst_ip") and not _valid_ip(v):
                    continue            # Is_IP guard (liblognormalize.c:137)
                if fld == "proto":
                    # only tcp/udp/icmp map to a protocol; anything else
                    # leaves proto unset (liblognormalize.c proto block)
                    v = v.lower()
                    if v not in ("tcp", "udp", "icmp"):
                        continue
                out[fld] = v
            return out
        return {}


def parse_rulebase(text: str) -> NormalizeTable:
    """Parse a liblognorm-v1-style rulebase: ``rule=[tags]:sample`` lines;
    ``#`` comments and blank lines ignored (the ln_loadSamples analog,
    liblognormalize.c:78-96)."""
    samples = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if not line.startswith("rule="):
            raise NormalizeError(f"unsupported rulebase line: {line!r}")
        try:
            _, sample = line.split(":", 1)
        except ValueError:
            raise NormalizeError(f"missing ':' in rulebase line: {line!r}")
        samples.append(sample)
    return NormalizeTable(samples)


def load_rulebase(path: str) -> NormalizeTable:
    with open(path) as f:
        return parse_rulebase(f.read())
