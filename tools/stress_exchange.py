"""Many-block exchange stress: drive hash_group_apply and the engine's
correlation exchange with thousands of tiny input blocks and report
driver RSS + held object-ref counts, demonstrating the coalescer keeps
driver memory flat (O(buckets), not O(blocks × buckets)).

Usage: python tools/stress_exchange.py [n_blocks] [rows_per_block]
Prints one JSON line; numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from sagan_ray.datapipe.exchange import hash_group_apply

    rng = np.random.default_rng(11)

    def make_block(i: int) -> pa.Table:
        return pa.table({
            "k": pa.array(rng.integers(0, 50_000, rows), pa.int64()),
            "v": pa.array(rng.random(rows), pa.float64()),
        })

    # one input block per item — from_arrow of n_blocks tables
    blocks = [make_block(i) for i in range(n_blocks)]
    ds = rd.from_arrow(blocks)
    rss_before = rss_mb()

    def agg(df):
        return df.groupby("k", sort=False)["v"].sum().reset_index()

    out = hash_group_apply(ds, ["k"], agg,
                           out_schema=pa.schema([("k", pa.int64()),
                                                 ("v", pa.float64())]))
    n_out = out.count()
    rss_after = rss_mb()

    print(json.dumps({
        "metric": "exchange driver RSS over many tiny blocks",
        "n_blocks": n_blocks,
        "rows_per_block": rows,
        "distinct_keys_out": int(n_out),
        "rss_before_mb": round(rss_before, 1),
        "rss_after_mb": round(rss_after, 1),
        "rss_growth_mb": round(rss_after - rss_before, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
