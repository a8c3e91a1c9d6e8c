"""liblognorm-analog normalization: rulebase parsing/matching semantics +
oracle≡pipeline parity for rules gating on normalized fields
(reference src/liblognormalize.c:105-264, rules.c:2764-2766)."""

from sagan_ray.functions.normalize import load_rulebase, parse_rulebase
from sagan_ray.synth import NORMALIZE_RULEBASE, build_lookups

from .helpers import RULESET_DIR, run_both
from .test_correlation import hits_of, mk


def test_rulebase_extraction_semantics():
    nt = parse_rulebase(NORMALIZE_RULEBASE)
    # full template match → fields extracted; 'ssh' is not tcp/udp/icmp
    # so proto stays unset (liblognormalize.c proto block)
    got = nt.apply("4625: auth failure for alice from 10.1.2.3:2222 via ssh")
    assert got == {"username": "alice", "src_ip": "10.1.2.3",
                   "src_port": "2222"}
    # tcp-valued proto survives, both endpoints extracted
    got = nt.apply("connection from 1.2.3.4:10 to 5.6.7.8:20 proto tcp state up")
    assert got == {"src_ip": "1.2.3.4", "src_port": "10",
                   "dst_ip": "5.6.7.8", "dst_port": "20", "proto": "tcp"}
    # samples must match the WHOLE message (liblognorm sample semantics)
    assert nt.apply("prefix 4625: auth failure for a from 1.2.3.4:1 via ssh") == {}
    # Is_IP guard: a malformed address is dropped, other fields survive
    got = nt.apply("4625: auth failure for bob from 999.999.1.1:5 via ssh")
    assert got == {"username": "bob", "src_port": "5"}


def test_rulebase_file_loader():
    import os

    nt = load_rulebase(os.path.join(RULESET_DIR, "normalize.rulebase"))
    got = nt.apply("login failed user carol from 10.9.9.9:88")
    assert got == {"username": "carol", "src_ip": "10.9.9.9", "src_port": "88"}


def test_normalize_flow_gate_parity():
    """Rules with NO parse_* options gate on normalized src_ip/src_port;
    a rule without `normalize` must not see the fields."""
    rules = """
alert any any 2222 -> any any (msg:"norm port"; normalize; content:"auth failure"; sid:1;)
alert any [10.0.0.0/8] any -> any any (msg:"norm net"; normalize; content:"auth failure"; sid:2;)
alert any any 2222 -> any any (msg:"no norm"; content:"auth failure"; sid:3;)
alert tcp any any -> any any (msg:"norm proto"; normalize; content:"proto tcp"; sid:4;)
"""
    tbl = mk([
        ("a", 0, "4625: auth failure for alice from 10.1.2.3:2222 via ssh", 0),
        ("a", 1, "4625: auth failure for bob from 192.0.2.9:2222 via ssh", 10),
        ("a", 2, "4625: auth failure for eve from 10.5.5.5:9999 via ssh", 20),
        ("a", 3, "connection from 1.2.3.4:10 to 5.6.7.8:20 proto tcp state up", 30),
    ])
    oracle, _ = run_both(rules, tbl)
    assert hits_of(oracle) == [("a", 0, 1), ("a", 0, 2), ("a", 1, 1),
                               ("a", 2, 2), ("a", 3, 4)]


def test_normalize_username_tracking_parity():
    """Normalized username feeds after-tracking through the correlator
    (the stateful path carries the username column)."""
    rules = """
alert any any any -> any any (msg:"brute"; normalize; content:"auth failure"; after: track by_username, count 2, seconds 86400; sid:5;)
"""
    tbl = mk([
        ("a", 0, "4625: auth failure for alice from 10.1.2.3:1 via ssh", 0),
        ("a", 1, "4625: auth failure for bob from 10.1.2.3:2 via ssh", 10),
        ("a", 2, "4625: auth failure for alice from 10.9.9.9:3 via ssh", 20),
        ("a", 3, "4625: auth failure for alice from 10.1.1.1:4 via ssh", 30),
        ("a", 4, "4625: auth failure for bob from 10.1.2.3:5 via ssh", 40),
    ])
    oracle, _ = run_both(rules, tbl)
    # per-username count must exceed 2: alice's 3rd hit alerts, bob never
    routed = sorted((c, t) for _, _, c, t in oracle.routed)
    assert ("a", 3) in {(c, t) for c, t in routed}
    assert all(t != 4 for _, t in routed)


def test_normalize_fuzzed_against_lookups():
    """Randomized transcripts through rules mixing normalize with other
    options — parity only (no expected hits)."""
    from sagan_ray.synth import gen_transcripts

    rules = """
alert any any any -> any any (msg:"n1"; normalize; content:"login"; sid:10;)
alert udp any any -> any any (msg:"n2"; normalize; content:"session"; parse_proto; sid:11;)
alert any [10.0.0.0/9] any -> any any (msg:"n3"; normalize; content:"failed"; sid:12;)
"""
    tbl = gen_transcripts(1500, seed=77)
    run_both(rules, tbl, lookups=build_lookups(), expect_hits=False)
