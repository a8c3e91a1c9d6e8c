"""Generate the FIXTURES.md §4 expected-output artifacts: for each fixture
ruleset × the deterministic transcript table, run the oracle evaluator and
write expected_hits / expected_routed / expected_counts parquet — an
externally inspectable golden corpus (the reference ships none; SURVEY §5).

Usage: python tools/make_expected.py [out_dir] [n_turns] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from sagan_ray.config import EngineConfig
from sagan_ray.oracle import ReferenceEvaluator
from sagan_ray.rules import parse_rules_file
from sagan_ray.synth import build_lookups, gen_transcripts

FAMILIES = ["content", "meta", "pcre", "prematch", "eventid", "json",
            "extract", "enrich", "correlate", "routing"]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sagan_ray_expected"
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tbl = gen_transcripts(n_turns, seed=seed)
    rows = tbl.to_pylist()
    lookups = build_lookups()
    for fam in FAMILIES:
        rs = parse_rules_file(os.path.join(root, "rulesets", f"{fam}.rules"))
        res = ReferenceEvaluator(rs, lookups, EngineConfig()).evaluate(rows)
        d = os.path.join(out_dir, fam)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "conv_id": pa.array([h[0] for h in res.hits], pa.string()),
            "turn_idx": pa.array([h[1] for h in res.hits], pa.int32()),
            "sid": pa.array([h[2] for h in res.hits], pa.int64()),
        }), os.path.join(d, "expected_hits.parquet"))
        pq.write_table(pa.table({
            "sink": pa.array([r[0] for r in res.routed], pa.string()),
            "sid": pa.array([r[1] for r in res.routed], pa.int64()),
            "conv_id": pa.array([r[2] for r in res.routed], pa.string()),
            "turn_idx": pa.array([r[3] for r in res.routed], pa.int32()),
        }), os.path.join(d, "expected_routed.parquet"))
        counts = res.routed_counts()
        pq.write_table(pa.table({
            "sink": pa.array([k[0] for k in counts], pa.string()),
            "sid": pa.array([k[1] for k in counts], pa.int64()),
            "n": pa.array(list(counts.values()), pa.int64()),
        }), os.path.join(d, "expected_counts.parquet"))
        print(f"{fam}: hits={len(res.hits)} routed={len(res.routed)}")
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
