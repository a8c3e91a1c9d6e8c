"""json_decode_base64, flexbit port-tracked directions, EVE log-all."""

import base64
import json

from .helpers import run_both
from .test_correlation import mk, hits_of


def test_json_decode_base64():
    secret = base64.b64encode(b"attack-string").decode()
    rules = """
alert any any any -> any any (msg:"b64"; json_content:".payload","attack-string"; json_decode_base64; sid:1;)
alert any any any -> any any (msg:"b64 contains"; json_content:".payload","tack"; json_contains; json_decode_base64; sid:2;)
alert any any any -> any any (msg:"raw miss"; json_content:".payload","attack-string"; sid:3;)
"""
    tbl = mk([
        ("a", 0, json.dumps({"payload": secret}), 0),
        ("a", 1, json.dumps({"payload": "attack-string"}), 10),
    ])
    oracle, _ = run_both(rules, tbl)
    assert hits_of(oracle) == [("a", 0, 1), ("a", 0, 2), ("a", 1, 3)]


def test_flexbit_port_directions():
    rules = """
alert any any any -> any any (msg:"set"; content:"conn from"; parse_src_ip:1; parse_dst_ip:2; parse_port; flexbits: set,fp,300; flexbit_noalert; sid:1;)
alert any any any -> any any (msg:"isset both_p"; content:"check"; parse_src_ip:1; parse_dst_ip:2; parse_port; flexbits: isset,both_p,fp; sid:2;)
"""
    tbl = mk([
        ("a", 0, "conn from 1.2.3.4:10 to 5.6.7.8:20", 0),
        ("a", 1, "check 1.2.3.4:10 then 5.6.7.8:20", 10),    # same endpoints+ports
        ("a", 2, "check 1.2.3.4:99 then 5.6.7.8:20", 20),    # src port differs
    ])
    oracle, _ = run_both(rules, tbl)
    assert hits_of(oracle) == [("a", 0, 1), ("a", 1, 2)]


def test_eve_log_all_rows():
    import ray.data as rd

    from sagan_ray.io.sinks import eve_log_all
    from sagan_ray.synth import gen_transcripts

    tbl = gen_transcripts(300, seed=11)
    out = eve_log_all(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == len(tbl)
    rec = json.loads(out["eve"].iloc[0])
    assert rec["event_type"] == "log" and "payload" in rec
