"""Live cross-instance shared xbit state (state/shared.py) — the
xbit-redis analog (reference src/xbit-redis.c): separate run_engine
invocations naming one shared store observe each other's xbits, so a
bit SET by "instance A" gates a rule evaluated by "instance B" even
though neither shares a state_dir. Also: unset propagation, prune, and
non-interference when the store name differs."""

import collections
import uuid

from sagan_ray.config import EngineConfig
from sagan_ray.pipelines.engine import run_engine
from sagan_ray.rules import parse_rules
from sagan_ray.synth import build_lookups

from .test_correlation import mk

RULES = """
alert any any any -> any any (msg:"set"; content:"login failed"; xbits: set,brute,track ip_src,expire 600; sid:1;)
alert any any any -> any any (msg:"isset"; content:"login success"; xbits: isset,brute,track ip_src; sid:2;)
alert any any any -> any any (msg:"unset"; content:"logout"; xbits: unset,brute,track ip_src; sid:4;)
"""


def _run(tbl, shared=None, state_dir=None):
    import ray.data as rd

    eng = run_engine(rd.from_arrow(tbl), parse_rules(RULES),
                     build_lookups(), EngineConfig(), batch_size=512,
                     shared_bits=shared, state_dir=state_dir)
    df = eng.routed().to_pandas()
    if df.empty:          # all-empty Dataset.to_pandas() loses columns
        return collections.Counter()
    return collections.Counter(
        zip(df["conv_id"], df["turn_idx"].astype(int), df["sid"].astype(int)))


def _name():
    return f"t-{uuid.uuid4().hex[:12]}"


def test_bit_set_by_one_instance_gates_another():
    """Instance A sets the bit; instance B's isset fires ONLY because
    the shared store carried it (no state_dir anywhere). The control
    run without a store name stays silent."""
    shared = _name()
    set_tbl = mk([("a", 0, "login failed", 0)])
    probe = mk([("a", 1, "login success", 100)])

    assert ("a", 1, 2) not in _run(probe)                 # no store: no bit
    got_a = _run(set_tbl, shared=shared)                  # instance A sets
    assert ("a", 0, 1) in got_a
    got_b = _run(probe, shared=shared)                    # instance B sees it
    assert ("a", 1, 2) in got_b
    # a DIFFERENT store name is a different keyspace (the reference's
    # per-sensor Redis keyspace requirement)
    assert ("a", 2, 2) not in _run(mk([("a", 2, "login success", 110)]),
                                   shared=_name())


def test_unset_propagates_and_expiry_respected():
    shared = _name()
    _run(mk([("a", 0, "login failed", 0)]), shared=shared)
    _run(mk([("a", 1, "logout", 50)]), shared=shared)     # instance B unsets
    got = _run(mk([("a", 2, "login success", 60)]), shared=shared)
    assert ("a", 2, 2) not in got                         # bit gone globally
    # re-set, then probe past the 600 s expiry: live flag but expired
    _run(mk([("b", 0, "login failed", 0)]), shared=shared)
    got = _run(mk([("b", 1, "login success", 700)]), shared=shared)
    assert ("b", 1, 2) not in got


def test_store_overrides_state_dir_snapshot(tmp_path):
    """Store-authoritative: with both shared_bits and state_dir, an
    unset published by ANOTHER instance beats this instance's own
    snapshot that still carries the bit as set."""
    import shutil

    shared = _name()
    sd = str(tmp_path / "st")
    _run(mk([("a", 0, "login failed", 0)]), shared=shared, state_dir=sd)
    # freeze a copy of the snapshot while it still carries the set bit
    stale = str(tmp_path / "stale")
    shutil.copytree(sd, stale)
    # other instance (no state_dir) unsets through the store
    _run(mk([("a", 1, "logout", 10)]), shared=shared)
    got = _run(mk([("a", 2, "login success", 20)]),
               shared=shared, state_dir=sd)
    assert ("a", 2, 2) not in got
    # the stale snapshot alone WOULD fire — the exact divergence redis
    # mode exists to prevent
    got_local = _run(mk([("a", 3, "login success", 30)]), state_dir=stale)
    assert ("a", 3, 2) in got_local


def test_store_ops_unit_and_prune():
    import ray

    from sagan_ray.state.shared import shared_bit_store

    store = shared_bit_store(_name())
    ray.get(store.apply.remote([("c", "b1", "k", 100),
                                ("c", "b1", "k", 0),      # later op wins
                                ("c", "b2", "k", 500)]))
    bits = dict((tuple(r[:3]), r[3]) for r in ray.get(store.fetch.remote()))
    assert bits[("c", "b1", "k")] == 0
    assert bits[("c", "b2", "k")] == 500
    assert ray.get(store.prune.remote(400)) == 1          # drops the unset
    bits = ray.get(store.fetch.remote())
    assert [tuple(r[:3]) for r in bits] == [("c", "b2", "k")]
    assert ray.get(store.prune.remote(500)) == 1
    assert ray.get(store.fetch.remote()) == []


def test_two_follow_loops_share_bits(tmp_path):
    """The deployment shape the reference's Redis mode exists for: two
    follow loops (own input dirs, own out_dirs/state_dirs — the flock
    allows this) observing each other's xbits through one named store
    at poll granularity."""
    import pyarrow.parquet as pq

    from sagan_ray.sources.stream import poll_once
    from sagan_ray.synth import build_lookups

    shared = _name()
    rules = parse_rules(RULES)
    in_a, in_b = tmp_path / "in_a", tmp_path / "in_b"
    in_a.mkdir(), in_b.mkdir()
    out_a, out_b = str(tmp_path / "out_a"), str(tmp_path / "out_b")

    # sensor A sees the brute-force trigger
    pq.write_table(mk([("a", 0, "login failed", 0)]),
                   in_a / "f0.parquet")
    res = poll_once(str(in_a), out_a, rules, build_lookups(),
                    EngineConfig(), shared_bits=shared)
    assert res["routed"] >= 1

    # sensor B sees only the probe — fires via the shared bit
    pq.write_table(mk([("a", 1, "login success", 100)]),
                   in_b / "f0.parquet")
    res = poll_once(str(in_b), out_b, rules, build_lookups(),
                    EngineConfig(), shared_bits=shared)
    assert res["routed"] >= 1
    import pandas as pd

    alerts = pd.read_parquet(f"{out_b}/alerts")
    assert 2 in alerts["sid"].astype(int).tolist()
