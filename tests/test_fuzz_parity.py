"""Seeded randomized parity fuzz: generate random rulesets over random
transcript tables and require oracle ≡ Ray on every one. Catches
interaction bugs the hand-written fixtures miss (random window bounds,
random stateful parameters, random orderings). Fully deterministic —
failures reproduce by seed."""

import numpy as np
import pytest

from sagan_ray.rules import parse_rules
from sagan_ray.synth import gen_transcripts

from .helpers import run_both

WORDS = ["login", "failed", "success", "ERROR", "timeout", "beacon",
         "connection", "malware", "user", "alice", "heartbeat", "résumé"]


def _rand_rule(rng: np.random.Generator, sid: int) -> str:
    opts = []
    action = rng.choice(["alert"] * 6 + ["drop", "pass"])
    # 1-3 content atoms with random windows
    for _ in range(int(rng.integers(1, 4))):
        w = WORDS[int(rng.integers(0, len(WORDS)))]
        neg = "!" if rng.integers(0, 5) == 0 else ""
        opts.append(f'content:{neg}"{w}"')
        if rng.integers(0, 3) == 0:
            opts.append(f"offset:{int(rng.integers(0, 30))}")
        if rng.integers(0, 3) == 0:
            opts.append(f"depth:{int(rng.integers(1, 40))}")
        if rng.integers(0, 4) == 0:
            opts.append(f"distance:{int(rng.integers(1, 10))}")
            if rng.integers(0, 2) == 0:
                opts.append(f"within:{int(rng.integers(1, 30))}")
    if rng.integers(0, 3) == 0:
        w1, w2 = rng.choice(WORDS, 2, replace=False)
        opts.append(f'meta_content:"%sagan%",{w1},{w2}')
        if rng.integers(0, 2) == 0:
            opts.append("meta_nocase")
        if rng.integers(0, 3) == 0:
            opts.append(f"meta_offset:{int(rng.integers(0, 25))}")
        if rng.integers(0, 3) == 0:
            opts.append(f"meta_depth:{int(rng.integers(1, 40))}")
        if rng.integers(0, 4) == 0:
            opts.append(f"meta_distance:{int(rng.integers(1, 10))}")
            if rng.integers(0, 2) == 0:
                opts.append(f"meta_within:{int(rng.integers(1, 30))}")
    if rng.integers(0, 3) == 0:
        w = WORDS[int(rng.integers(0, len(WORDS)))]
        opts.append(f'pcre:"/{w} \\w+/"')
    if rng.integers(0, 4) == 0:
        opts.append(f'program:"{rng.choice(["user", "assistant", "sys*", "to?l"])}"')
    if rng.integers(0, 6) == 0:
        opts.append("append_program")
    if rng.integers(0, 5) == 0:
        sev = rng.choice(["low", "critical", "HIGH"])
        kind = rng.integers(0, 3)
        if kind == 0:
            opts.append(f'json_content:".severity","{sev}"')
            if rng.integers(0, 2) == 0:
                opts.append("json_nocase")
        elif kind == 1:
            opts.append('json_pcre:".event","/^(sort|merge)/"')
        else:
            opts.append('json_meta_content:".severity",low,high')
    if rng.integers(0, 6) == 0:
        opts.append('json_map:"username",".username"')
    if rng.integers(0, 8) == 0:
        opts.append('json_map:"message",".event"')
    if rng.integers(0, 10) == 0:
        opts.append('json_map:"program",".severity"')
    if rng.integers(0, 6) == 0:
        opts.append("normalize")
    if rng.integers(0, 10) == 0:
        kind = rng.choice(["ip_reputation", "file_hash", "filename"])
        cats = rng.choice(["MALICIOUS", "MALICIOUS,TOR", "RANSOMWARE"])
        if kind == "ip_reputation":
            tr = rng.choice(["by_src", "all"])
            opts.append("parse_src_ip:1")
            opts.append(f"bluedot: type ip_reputation, track {tr}, none, {cats}")
        else:
            opts.append(f"bluedot: type {kind}, {cats}")
    if rng.integers(0, 6) == 0:
        days = "".join(sorted(set(str(d) for d in rng.integers(0, 7, size=4))))
        a, b = int(rng.integers(0, 2400)), int(rng.integers(0, 2400))
        opts.append(f"alert_time: days {days}, hours {a:04d}-{b:04d}")
    if rng.integers(0, 6) == 0:
        opts.append("parse_src_ip:1")
        g = rng.integers(0, 3)
        if g == 0:
            opts.append(f'country_code: track by_src, '
                        f'{rng.choice(["is", "isnot"])} RU,US')
        elif g == 1:
            opts.append(f'blacklist: {rng.choice(["by_src", "all"])}')
    # stateful options
    kind = rng.integers(0, 8)
    if kind == 0:
        opts.append(f"after: track by_src, count {int(rng.integers(1, 4))}, "
                    f"seconds {int(rng.integers(30, 900))}")
    elif kind == 1:
        t = rng.choice(["limit", "suppress"])
        opts.append(f"threshold: type {t}, track by_src, "
                    f"count {int(rng.integers(1, 4))}, seconds {int(rng.integers(30, 900))}")
    elif kind == 2:
        op = rng.choice(["set", "isset", "isnotset", "unset"])
        name = rng.choice(["b1", "b2"])
        track = rng.choice(["ip_src", "ip_pair"])
        opts.append(f"xbits: {op},{name},track {track},expire {int(rng.integers(60, 600))}")
    elif kind == 3:
        op = rng.choice(["set", "isset", "isnotset"])
        if op == "set":
            opts.append(f"flexbits: set,f1,{int(rng.integers(60, 600))}")
        else:
            opts.append(f"flexbits: {op},none,f1")
    # header flow gates (proto / port-eq) — with NO parse_* options some
    # of the time, so the bare-flow-gate residual path is exercised
    # (regression: slow_gates once omitted proto/port-eq)
    proto = "any"
    sport = dport = "any"
    if rng.integers(0, 3) == 0:
        proto = str(rng.choice(["tcp", "udp", "icmp"]))
        if rng.integers(0, 2) == 0:
            opts.append("parse_proto")
        if rng.integers(0, 3) == 0:
            opts.append(f"default_proto:{rng.choice(['tcp', 'udp'])}")
    if rng.integers(0, 5) == 0:
        dport = str(int(rng.integers(1, 100)))
        if rng.integers(0, 2) == 0:
            opts.append(f"default_dst_port:{dport}")
    opts.append(f"msg:\"fuzz {sid}\"")
    opts.append(f"sid:{sid}")
    return f"{action} {proto} any {sport} -> any {dport} ({'; '.join(opts)};)"


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505,
                                  606, 707, 808, 909, 1111,
                                  1212, 1313, 1414, 1515, 1616])
def test_fuzz_ruleset_parity(seed):
    rng = np.random.default_rng(seed)
    text = "\n".join(_rand_rule(rng, 5000 + i) for i in range(int(rng.integers(4, 10))))
    ruleset = parse_rules(text)
    tbl = gen_transcripts(int(rng.integers(800, 2500)), seed=seed)
    run_both(ruleset, tbl, expect_hits=False)
