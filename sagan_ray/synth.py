"""Deterministic synthetic transcript + lookup-table generator.

Produces the FIXTURES.md §1 table shape (the BASELINE.json input_hint):
``(conv_id:string, turn_idx:int32, role:string, text:large_string,
tool:string, ts:timestamp[us])`` with Zipf-skewed conversation sizes,
templated payloads that exercise every extractor (IPs+ports, hashes,
windows event-ids, JSON, base64, non-ASCII, empty), monotone per-conv
timestamps with occasional window-breaking gaps, and a disk-shuffled row
order so stable-ordering logic is actually exercised.

Everything is seeded — the same (seed, n_turns) always yields the same
table, so tests, oracles and benches agree without shipping data.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import Lookups
from .functions.ip import CidrTable

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.large_string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "bash", "search", "browser", "editor", ""]
USERS = ["alice", "bob", "carol", "dave", "eve", "mallory", "trent"]
WORDS = ("query sort merge join filter window batch stream table scan key "
         "hash group row data fast slow big small spark shard block page").split()
FILES = ["a.dll", "setup.exe", "run.sh", "payload.bin", "doc.pdf"]
SEVERITIES = ["low", "medium", "high", "critical"]

BASE_TS = datetime(2024, 3, 1, 0, 0, 0)


# ----------------------------------------------------------------------
# lookup tables (FIXTURES.md §3) — synthetic, no external data
# ----------------------------------------------------------------------

def geo_entries() -> list[tuple[str, str]]:
    """~100 disjoint CIDR→country ranges, v4+v6."""
    out = []
    ccs = ["US", "DE", "FR", "CN", "RU", "BR", "IN", "JP", "GB", "NL"]
    for i in range(96):
        out.append((f"10.{i}.0.0/16", ccs[i % len(ccs)]))
    out.append(("192.168.0.0/16", "US"))
    out.append(("203.0.113.0/24", "RU"))
    out.append(("2001:db8::/48", "DE"))
    out.append(("fe80::/64", "JP"))
    return out


def blacklist_entries() -> list[str]:
    return ["10.13.0.0/16", "10.66.0.0/16", "203.0.113.0/26", "2001:db8::/64"]


def intel_entries() -> dict[str, list[str]]:
    md5s = [hashlib.md5(f"bad{i}".encode()).hexdigest() for i in range(4)]
    sha256s = [hashlib.sha256(f"bad{i}".encode()).hexdigest() for i in range(4)]
    return {
        "ip": ["10.7.7.7", "203.0.113.99", "10.66.1.2"],
        "hash": md5s + sha256s,
        "domain": ["evil.example.com", "bad.test"],
        "url": ["http://evil.example.com/x"],
        "username": ["mallory", "eve"],
        "filename": ["payload.bin"],
        "software": ["badagent/1.0"],
    }


# liblognorm-analog rulebase over the synthetic templates (kept in sync
# with rulesets/normalize.rulebase, which exercises the file loader)
NORMALIZE_RULEBASE = """
rule=:%eid:number%: auth failure for %username:word% from %src-ip:ipv4%:%src-port:number% via %proto:word%
rule=:%eid:number%: authentication failure for %username:word% from %src-ip:ipv4%:%src-port:number% via %proto:word%
rule=:%eid:number%: authentication success for %username:word% from %src-ip:ipv4%:%src-port:number% via %proto:word%
rule=:connection from %src-ip:ipv4%:%src-port:number% to %dst-ip:ipv4%:%dst-port:number% proto %proto:word% state %state:word%
rule=:login %stage:word% user %username:word% from %src-ip:ipv4%:%src-port:number%
"""


def bluedot_entries() -> dict[str, dict[str, str]]:
    """Offline bluedot category snapshot (kind → value → CATEGORY).
    The ip values are the deterministic event-template IPs of users 7
    and 99 plus the blacklist-bait addresses."""
    return {
        "ip": {"10.7.49.8": "MALICIOUS", "10.99.181.100": "MALICIOUS",
               "10.13.7.7": "TOR", "10.66.1.2": "PROXY"},
        "hash": {hashlib.md5(b"bad0").hexdigest(): "MALICIOUS",
                 hashlib.md5(b"bad1").hexdigest(): "RANSOMWARE"},
        "url": {"http://evil.example.com/x": "MALICIOUS"},
        "filename": {"payload.bin": "MALICIOUS"},
        "ja3": {"e7d705a3286e19ea42f587b344ee6865": "MALICIOUS"},
    }


def build_lookups() -> Lookups:
    from .functions.normalize import parse_rulebase

    return Lookups(
        geo=CidrTable(geo_entries()),
        blacklist=CidrTable([(c, "1") for c in blacklist_entries()]),
        intel={k: set(v) for k, v in intel_entries().items()},
        normalize=parse_rulebase(NORMALIZE_RULEBASE),
        bluedot=bluedot_entries(),
    )


# ----------------------------------------------------------------------
# transcripts
# ----------------------------------------------------------------------

def _bad_md5(i: int) -> str:
    return hashlib.md5(f"bad{i}".encode()).hexdigest()


def _mk_text(rng: np.random.Generator, user: str) -> str:
    """One templated turn payload. Template mix per FIXTURES.md §1."""
    t = rng.integers(0, 100)
    w = lambda: WORDS[rng.integers(0, len(WORDS))]
    ip4 = lambda: f"10.{rng.integers(0, 128)}.{rng.integers(0, 256)}.{rng.integers(1, 255)}"
    port = lambda: int(rng.integers(1, 65535))

    if t < 25:  # plain prose
        return f"the {w()} {w()} ran a {w()} over the {w()} {w()} then {w()}"
    if t < 40:  # auth failure w/ windows-style event id + ip:port + user
        code = 4625 if rng.integers(0, 3) else 4624
        return (f"{code}: authentication {'failure' if code == 4625 else 'success'} "
                f"for {user} from {ip4()}:{port()} via ssh")
    if t < 50:  # connection line, two IPs
        return (f"connection from {ip4()}:{port()} to {ip4()}:{port()} proto tcp "
                f"state {w()}")
    if t < 58:  # hash line
        k = rng.integers(0, 6)
        h = _bad_md5(int(k)) if k < 2 else hashlib.md5(str(int(rng.integers(0, 1 << 30))).encode()).hexdigest()
        return f"malware scan md5 {h} found in {FILES[rng.integers(0, len(FILES))]}"
    if t < 68:  # JSON message
        obj = {
            "event": str(w()),
            "k": int(rng.integers(0, 100)),
            "username": user,
            "severity": SEVERITIES[rng.integers(0, 4)],
            "nested": {"depth": int(rng.integers(0, 5)), "flag": bool(rng.integers(0, 2))},
        }
        return json.dumps(obj, separators=(", ", ": "))
    if t < 74:  # base64 blob
        raw = bytes(rng.integers(0, 256, size=24, dtype=np.uint8))
        return f"payload b64 {base64.b64encode(raw).decode()} end"
    if t < 80:  # ipv6 session
        v6 = f"2001:db8::{rng.integers(1, 0xffff):x}"
        return f"session [{v6}]:443 established proto tcp"
    if t < 86:  # error/timeout lines for content rules
        return (f"ERROR: {w()} failed with timeout after {rng.integers(1, 60)}s "
                f"retry={rng.integers(0, 5)}")
    if t < 90:  # login sequence lines for correlation rules
        stage = ["login attempt", "login failed", "login success", "logout"][rng.integers(0, 4)]
        return f"{stage} user {user} from {ip4()}:{port()}"
    if t < 94:  # unicode / bytes preservation
        return f"ユーザー {user} が {w()} を実行 — résumé ✓ {chr(0x1F600 + int(rng.integers(0, 40)))}"
    if t < 96:  # heartbeat noise (ignore-list target)
        return f"DEBUG heartbeat noise seq={rng.integers(0, 10 ** 6)}"
    if t < 98:  # empty / whitespace (ValidateMessage analog)
        return "" if rng.integers(0, 2) else "   "
    # blacklist/intel bait
    k = rng.integers(0, 3)
    bad_ip = ["10.13.7.7", "10.66.1.2", "203.0.113.99"][k]
    return f"beacon to {bad_ip}:{port()} domain evil.example.com"


def gen_transcripts(n_turns: int, seed: int = 42, n_convs: int | None = None,
                    conv_offset: int = 0) -> pa.Table:
    """Deterministic transcript table with ~n_turns rows (exact count may
    round to fill whole conversations). ``conv_offset`` shifts conv ids so
    chunked generation never collides."""
    rng = np.random.default_rng(seed)
    if n_convs is None:
        n_convs = max(4, n_turns // 25)

    # Zipf-skewed turns per conversation, scaled to hit n_turns total
    raw = rng.zipf(1.5, size=n_convs).astype(np.float64)
    raw = np.minimum(raw, 200.0)
    sizes = np.maximum(1, (raw / raw.sum() * n_turns)).astype(np.int64)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[datetime] = []

    for k in range(n_convs):
        cid = f"conv-{conv_offset + k:08d}"
        user = USERS[k % len(USERS)]
        n = int(sizes[k])
        t = BASE_TS + timedelta(seconds=int(rng.integers(0, 86400 * 14)))
        for i in range(n):
            conv_ids.append(cid)
            turn_idxs.append(i)
            role = ROLES[int(rng.integers(0, len(ROLES)))]
            roles.append(role)
            tools.append(TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool"
                         else ("" if rng.integers(0, 4) else TOOLS[int(rng.integers(0, len(TOOLS)))]))
            texts.append(_mk_text(rng, user))
            tss.append(t)
            gap = float(rng.uniform(1, 30))
            if rng.integers(0, 50) == 0:       # window-breaking gap
                gap = float(rng.uniform(400, 900))
            t = t + timedelta(seconds=gap)

    tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.large_string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    }, schema=SCHEMA)

    # shuffle on disk so ordered-output logic is exercised
    perm = rng.permutation(len(tbl))
    return tbl.take(pa.array(perm))


def write_transcripts(out_dir: str, n_turns: int, seed: int = 42,
                      rows_per_file: int = 250_000) -> str:
    """Write a sharded Parquet directory (idempotent: skipped when the
    manifest matches). Multi-file layout so ``read_parquet`` parallelizes."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"n_turns": n_turns, "seed": seed, "rows_per_file": rows_per_file, "v": 3}
    if os.path.exists(manifest):
        try:
            with open(manifest) as f:
                if json.load(f) == want:
                    return out_dir
        except Exception:
            pass
        for f in os.listdir(out_dir):
            os.unlink(os.path.join(out_dir, f))

    # generate in deterministic chunks (seed offset per chunk) to bound
    # memory at bench scale
    chunk = 500_000
    part = 0
    remaining = n_turns
    cseed = seed
    conv_offset = 0
    while remaining > 0:
        this = min(chunk, remaining)
        tbl = gen_transcripts(this, seed=cseed, conv_offset=conv_offset)
        conv_offset += 10_000_000  # chunks own disjoint conv-id ranges
        for off in range(0, len(tbl), rows_per_file):
            pq.write_table(tbl.slice(off, rows_per_file),
                           os.path.join(out_dir, f"part-{part:05d}.parquet"),
                           row_group_size=min(rows_per_file, 32768))
            part += 1
        remaining -= this
        cseed += 1000  # distinct rng stream per chunk
    with open(manifest, "w") as f:
        json.dump(want, f)
    return out_dir
