"""Unit tests: rule parser details and the shared extractor functions."""

import pytest

from sagan_ray.functions.ip import CidrTable, extract_ips, net_group_contains
from sagan_ray.functions.textutil import (
    extract_event_id,
    extract_hashes,
    flatten_json,
    prematch_regex,
    try_parse_json_text,
)
from sagan_ray.rules import parse_rules
from sagan_ray.rules.parser import RuleParseError


def test_parse_header_and_meta():
    rs = parse_rules('alert tcp [10.0.0.0/8,!10.13.0.0/16] 22 -> any any '
                     '(msg:"m"; content:"x"; sid:5; rev:3; classtype:"ct"; priority:2;)')
    r = rs.rules[0]
    assert r.action == "alert" and r.proto == "tcp"
    assert r.src_port_eq == 22 and r.dst_port_eq is None
    assert len(r.src_nets) == 2 and r.src_nets[1][2] is True
    assert (r.sid, r.rev, r.classtype, r.priority) == (5, 3, "ct", 2)


def test_parse_content_modifiers_bind_to_last():
    rs = parse_rules('alert any any any -> any any (content:"a"; nocase; '
                     'content:!"b"; offset:5; depth:10; content:"c"; distance:2; within:7; sid:1;)')
    a, b, c = rs.rules[0].contents
    assert a.nocase and not b.nocase
    assert b.negated and b.offset == 5 and b.depth == 10
    assert c.distance == 2 and c.within == 7
    # window math (content.c quirks): depth keeps D+1, within keeps W
    assert a.window(0) == (0, None)
    assert b.window(0) == (5, 16)
    assert c.window(10) == (13, 20)


def test_parse_hex_escapes():
    rs = parse_rules('alert any any any -> any any (content:"a|3a 20|b"; sid:1;)')
    assert rs.rules[0].contents[0].pattern == "a: b"


def test_parse_semicolon_inside_quotes():
    rs = parse_rules(r'alert any any any -> any any (msg:"a\;b"; content:"x;y"; sid:1;)')
    assert rs.rules[0].msg == "a;b"
    assert rs.rules[0].contents[0].pattern == "x;y"


def test_parse_missing_sid_raises():
    with pytest.raises(RuleParseError):
        parse_rules('alert any any any -> any any (msg:"m"; content:"x";)')


def test_parse_unknown_option_raises():
    with pytest.raises(RuleParseError):
        parse_rules('alert any any any -> any any (bogus_option:"x"; sid:1;)')


def test_parse_stateful_specs():
    rs = parse_rules(
        'alert any any any -> any any (xbits: set,n1,track ip_pair,expire 42; '
        'flexbits: count,by_src,>3,fb; '
        'after: track by_src&by_username, count 5, seconds 300; '
        'threshold: type suppress, track by_dst, count 9, seconds 60; sid:1;)')
    r = rs.rules[0]
    assert r.xbits[0].expire == 42 and r.xbits[0].track == "ip_pair"
    assert r.flexbits[0].count_op == ">" and r.flexbits[0].count_val == 3
    assert r.after.by_username and r.after.count == 5
    assert r.threshold.ttype == "suppress" and r.threshold.by_dst
    assert r.is_stateful


def test_extract_ips_positional_and_ports():
    ips = extract_ips("from 1.2.3.4:22 to 5.6.7.8#443 then [fe80::1]:80 and 9.9.9.9 port 53")
    assert ips == [("1.2.3.4", 22), ("5.6.7.8", 443), ("fe80::1", 80), ("9.9.9.9", 53)]


def test_extract_ips_rejects_invalid():
    assert extract_ips("999.1.2.3 and 1.2.3 and ::") == []
    assert extract_ips("ver 1.2.3.4.5 ok") == []       # part of longer dotted run


def test_extract_hashes():
    md5 = "d" * 32
    sha256 = "e" * 64
    h = extract_hashes(f"x {md5} y {sha256} z")
    assert h["md5"] == md5 and h["sha256"] == sha256 and h["sha1"] == ""


def test_hash_not_inside_longer_hex():
    h = extract_hashes("a" * 64)
    assert h["md5"] == "" and h["sha1"] == "" and h["sha256"] == "a" * 64


def test_event_id_head_window():
    assert extract_event_id("4625: login failed") == "4625"
    assert extract_event_id("prefix 4625: x") == "4625"
    assert extract_event_id("aaaaaaaaaaaaaaa 4625: too far") == ""


def test_json_flatten_nested():
    j = try_parse_json_text('{"a": {"b": 1, "c": true}, "d": "x", "e": [1,2]}')
    assert j == {".a.b": "1", ".a.c": "true", ".d": "x", ".e": "[1,2]"}
    assert try_parse_json_text("not json") is None
    assert try_parse_json_text("[1,2]") is None


def test_flatten_max_objects():
    big = {str(i): i for i in range(400)}
    assert len(flatten_json(big)) == 256


def test_cidr_table():
    t = CidrTable([("10.0.0.0/16", "US"), ("10.1.0.0/16", "DE"), ("2001:db8::/48", "JP")])
    assert t.lookup("10.0.5.5") == "US"
    assert t.lookup("10.1.255.255") == "DE"
    assert t.lookup("10.2.0.1") is None
    assert t.lookup("2001:db8::42") == "JP"
    assert "10.0.0.1" in t and "11.0.0.1" not in t


def test_net_group_negation():
    from sagan_ray.rules.parser import _parse_net_group
    g = _parse_net_group("[10.0.0.0/8,!10.13.0.0/16]", {})
    assert net_group_contains(g, "10.5.0.1")
    assert not net_group_contains(g, "10.13.0.1")
    only_neg = _parse_net_group("[!10.0.0.0/8]", {})
    assert net_group_contains(only_neg, "11.0.0.1")
    assert not net_group_contains(only_neg, "10.0.0.1")


def test_prematch_wildcards():
    rx = prematch_regex("ass*|use?")
    assert rx.match("assistant") and rx.match("user")
    assert not rx.match("tool") and not rx.match("users")


def test_classification_config_assigns_priority():
    """classification.config (classifications.c:50-140): classtype looks
    up the rule priority; explicit priority after classtype overrides;
    unknown classtype aborts when a table is loaded."""
    import os

    import pytest

    from sagan_ray.rules import parse_rules
    from sagan_ray.rules.parser import RuleParseError, load_classifications

    cls = load_classifications(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rulesets", "classification.config"))
    assert cls["suspicious-login"] == 2

    rs = parse_rules("""
alert any any any -> any any (msg:"a"; content:"x"; classtype:suspicious-login; sid:1;)
alert any any any -> any any (msg:"b"; content:"x"; classtype:not-suspicious; priority:9; sid:2;)
alert any any any -> any any (msg:"c"; content:"x"; sid:3;)
""", classifications=cls)
    assert rs.rules[0].priority == 2
    assert rs.rules[1].priority == 9      # explicit override after classtype
    assert rs.rules[2].priority == 0

    with pytest.raises(RuleParseError):
        parse_rules('alert any any any -> any any (msg:"d"; '
                    'classtype:nope; sid:4;)', classifications=cls)
    # without a table: annotation-only, no abort
    rs2 = parse_rules('alert any any any -> any any (msg:"d"; '
                      'content:"x"; classtype:nope; sid:4;)')
    assert rs2.rules[0].classtype == "nope"


def test_parser_fifth_review_regressions():
    """Regressions from the full-parser review: meta $VAR comma lists,
    circular vars, backslash preservation, comments inside wrapped rules,
    malformed var lines, exact facility/tag matching."""
    import pytest

    from sagan_ray.rules import parse_rules
    from sagan_ray.rules.parser import RuleParseError

    # $VAR expanding to a comma list → one OR pattern per element
    rs = parse_rules('var USERS alice,bob\n'
                     'alert any any any -> any any (msg:"m"; '
                     'meta_content:"user %sagan%",$USERS; sid:1;)')
    assert rs.rules[0].meta_contents[0].patterns == ["user alice", "user bob"]

    # circular $VAR raises instead of hanging
    with pytest.raises(RuleParseError):
        parse_rules('var A $B\nvar B $A\n'
                    'alert any $A any -> any any (content:"x"; sid:2;)')

    # pcre literal backslash survives parsing: /a\\d/ = backslash + 'd'
    rs = parse_rules(r'alert any any any -> any any (pcre:"/a\\d/"; sid:3;)')
    assert rs.rules[0].pcres[0].pattern == r"a\\d"
    assert rs.rules[0].pcres[0].compiled().search("xa\\dy")
    assert not rs.rules[0].pcres[0].compiled().search("a7")

    # a comment line inside a \-wrapped rule is skipped, not glued
    rs = parse_rules('alert any any any -> any any (msg:"w"; \\\n'
                     '# interleaved comment\n'
                     'content:"x"; sid:4;)')
    assert rs.rules[0].sid == 4

    with pytest.raises(RuleParseError):
        parse_rules("var X\n")

    # facility/tag are exact per '|' token — no globs (engine.c:512-581)
    from sagan_ray.oracle.evaluator import _prematch

    assert _prematch("brow*", "brow*", wildcards=False)
    assert not _prematch("brow*", "browser", wildcards=False)
    assert _prematch("brow*", "browser", wildcards=True)   # program only


def test_query_registry_consistent():
    """QUERIES and ORACLES stay key-synchronized (the driver joins them
    by name), every entry is callable, every oracle is a non-empty SQL
    string, and registry order still leads with the engine family (the
    gate-window budget contract)."""
    from sagan_ray.pipelines.queries import ORACLES, QUERIES

    assert list(QUERIES) and list(ORACLES)
    assert set(QUERIES) == set(ORACLES)
    assert all(callable(v) for v in QUERIES.values())
    assert all(isinstance(v, str) and v.strip() for v in ORACLES.values())
    names = list(QUERIES)
    assert names[0].startswith("engine_")        # warmup + identity block
    # no duplicate result-column aliases drifting: spot that every SQL
    # has an ORDER BY (the compare sorts, but deterministic oracles are
    # part of the contract) except golden reads that end with one anyway
    single_row = {"corpus_stats", "corpus_vocab_sketch",
                  "parts_promo_revenue",
                  "parts_small_qty_revenue",
                  "text_bleu_corpus",
                  "forecast_revenue",
                  "text_chrf_corpus",
                  "text_wer_corpus"}                      # 1-row aggs
    missing = [k for k, v in ORACLES.items()
               if "ORDER BY" not in v.upper() and k not in single_row]
    assert not missing, missing
