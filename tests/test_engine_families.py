"""Oracle-vs-Ray parity across every rule-option family (FIXTURES.md §2),
over the deterministic synthetic transcript table."""

import pytest

from sagan_ray.config import EngineConfig
from sagan_ray.synth import gen_transcripts

from .helpers import run_both

FAMILIES = [
    "content.rules",
    "meta.rules",
    "pcre.rules",
    "prematch.rules",
    "eventid.rules",
    "json.rules",
    "extract.rules",
    "enrich.rules",
    "correlate.rules",
    "routing.rules",
]


@pytest.fixture(scope="module")
def tbl():
    return gen_transcripts(4000, seed=7)


@pytest.mark.parametrize("family", FAMILIES)
def test_family_parity(family, tbl):
    run_both(family, tbl)


def test_all_families_combined(tbl):
    """The whole fixture corpus as one ruleset — cross-family interactions
    (shared state names, pass ordering across files)."""
    import os

    from .helpers import RULESET_DIR
    text = "\n".join(open(os.path.join(RULESET_DIR, f)).read() for f in FAMILIES)
    run_both(text, tbl)


def test_ignore_list_and_counters(tbl):
    from sagan_ray.pipelines.engine import input_counters
    import ray.data as rd

    cfg = EngineConfig(ignore_list=("DEBUG heartbeat", "noise seq"))
    oracle, _ = run_both("content.rules", tbl, config=cfg)
    got = input_counters(rd.from_arrow(tbl), cfg)
    for k in ("events_received", "events_processed", "null_message", "ignored"):
        assert got[k] == oracle.counters[k], (k, got, oracle.counters)


def test_second_seed_parity():
    tbl2 = gen_transcripts(3000, seed=99)
    run_both("correlate.rules", tbl2)
    run_both("routing.rules", tbl2)


def test_bench_ruleset_parity():
    """The production-sized bench ruleset (107 rules: content/meta/pcre/
    json/enrich/correlation mix) against the oracle on synthetic
    transcripts — the most realistic rule mix gets the same parity gate
    as the per-family fixtures."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:        # repo root (for the documented
        sys.path.insert(0, root)    # `python -m pytest tests/` it already is)
    from bench import BENCH_RULES

    tbl = gen_transcripts(6000, seed=1234)
    run_both(BENCH_RULES, tbl,
             config=EngineConfig(ignore_list=("DEBUG heartbeat",)))


def test_list_form_classify_explodes_to_exploded_form():
    """The list-form emitter (exchange path) must be a lossless
    re-encoding: explode_match_lists(classify_list(batch)) ==
    classify_exploded(batch) byte-for-byte, on a ruleset mixing
    stateless, stateful, pass and field-extracting rules."""
    import pandas as pd

    from sagan_ray.config import EngineConfig
    from sagan_ray.rules import parse_rules
    from sagan_ray.stages.classify import RuleClassifier, explode_match_lists
    from sagan_ray.synth import gen_transcripts

    rules = parse_rules("""
alert any any any -> any any (msg:"a"; content:"login"; sid:1;)
alert any any any -> any any (msg:"b"; content:"user"; parse_src_ip: 1; parse_port; sid:2;)
pass  any any any -> any any (msg:"p"; content:"DEBUG"; sid:3;)
alert any any any -> any any (msg:"x"; content:"login"; xbits: set,seen,track ip_src,expire 600; sid:4;)
alert any any any -> any any (msg:"t"; content:"user"; threshold: type limit, track by_src, count 2, seconds 300; sid:5;)
pass  any any any -> any any (msg:"sp"; content:"error"; xbits: isset,seen,track ip_src; sid:6;)
alert any any any -> any any (msg:"z"; content:"error"; sid:7;)
""")
    tbl = gen_transcripts(4000, seed=11)
    cfg = EngineConfig()
    exploded = RuleClassifier(rules, None, cfg, list_form=False)(tbl)
    listed = RuleClassifier(rules, None, cfg, list_form=True)(tbl)
    back = explode_match_lists(listed)
    key = ["conv_id", "turn_idx", "rule_idx"]
    a = exploded.to_pandas().sort_values(key).reset_index(drop=True)
    b = back.to_pandas().sort_values(key).reset_index(drop=True)
    assert len(a) > 0, "fixture matched nothing — vacuous"
    pd.testing.assert_frame_equal(a, b)
    # the class split is real: both classes present
    sf = listed.column("stateful").to_pylist()
    assert True in sf and False in sf
