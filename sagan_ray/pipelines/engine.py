"""The end-to-end engine pipeline: parse/classify → correlate → route.

Ray-Data-first shape (SURVEY.md §3.4):

    ds = ray.data.read_parquet(transcripts)
    matches = ds.map_batches(RuleClassifier, ...)        # fused parse+classify
    stateful → groupby("conv_id").map_groups(correlate)  # ordered state machine
    routed  = matches.filter(emit)                       # alerts
    routed × sinks → write_parquet / counts              # fan-out + parity gate

Only matched rows of stateful rules cross the one hash shuffle
(groupby conv_id); everything else streams. The ruleset and lookup tables
are broadcast once via ``ray.put`` and read in each classifier actor's
``__init__``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..config import SINK_EMAIL, SINK_EXTERNAL, EngineConfig, Lookups
from ..rules.model import RuleSet
from ..stages.classify import MATCH_SCHEMA, RuleClassifier
from ..stages.correlate import make_correlator

_MATCH_COLS = [f.name for f in MATCH_SCHEMA]


@dataclass
class EngineResult:
    """Lazy handles over the match stream. ``matches`` rows are the
    saganfound analog (one row per routed rule match, pre-suppression);
    ``routed()`` filters to post-suppression alerts; ``routed_exploded()``
    fans out per sink."""

    matches: "ray.data.Dataset"
    ruleset: RuleSet
    config: EngineConfig

    def routed(self):
        return self.matches.map_batches(
            lambda t: t.filter(t.column("emit").combine_chunks()),
            batch_format="pyarrow")

    def routed_exploded(self):
        """One row per (alert × sink) — the Output() fan-out analog
        (reference src/output.c:63-149)."""
        sinks = tuple(self.config.sinks)
        email_rules = {r.idx for r in self.ruleset if r.email}
        external_rules = {r.idx for r in self.ruleset if r.external}

        def explode(tbl: pa.Table) -> pa.Table:
            tbl = tbl.filter(pc.equal(tbl.column("emit"), True))
            if len(tbl) == 0:
                out = tbl.append_column("sink", pa.array([], pa.string()))
                return out
            parts = []
            for s in sinks:
                parts.append(tbl.append_column("sink", pa.array([s] * len(tbl))))
            for s, idxset in ((SINK_EMAIL, email_rules), (SINK_EXTERNAL, external_rules)):
                if idxset:
                    m = pc.is_in(tbl.column("rule_idx"),
                                 value_set=pa.array(sorted(idxset), pa.int32()))
                    sub = tbl.filter(m)
                    if len(sub):
                        parts.append(sub.append_column("sink", pa.array([s] * len(sub))))
            return pa.concat_tables(parts)

        return self.matches.map_batches(explode, batch_format="pyarrow")

    # ---- aggregates (parity gates) -----------------------------------
    def _sid_counts(self, emitted_only: bool) -> dict[int, int]:
        """Pre-aggregated per-sid counts: one partial row per sid per
        batch crosses the exchange instead of every match row (the
        shuffle-minimizing aggregate pattern)."""

        def partial(tbl: pa.Table) -> pa.Table:
            if emitted_only:
                tbl = tbl.filter(tbl.column("emit").combine_chunks())
            g = pa.TableGroupBy(tbl.select(["sid"]), "sid").aggregate([([], "count_all")])
            return g.rename_columns(["sid", "n"])

        from ray.data.aggregate import Sum

        df = (self.matches.map_batches(partial, batch_format="pyarrow")
              .groupby("sid").aggregate(Sum("n", alias_name="n")).to_pandas())
        return dict(zip(df["sid"].astype(int), df["n"].astype(int)))

    def hit_counts(self) -> dict[int, int]:
        return self._sid_counts(emitted_only=False)

    def routed_counts(self) -> dict[tuple[str, int], int]:
        """Per-(sink, sid) alert counts. The sink fan-out is resolved
        driver-side from the ruleset (sinks per sid are static), so no
        exploded rows ever shuffle."""
        per_sid = self._sid_counts(emitted_only=True)
        out: dict[tuple[str, int], int] = {}
        by_sid = {}
        for r in self.ruleset:
            by_sid.setdefault(r.sid, r)
        for sid, n in per_sid.items():
            r = by_sid[sid]
            sinks = list(self.config.sinks)
            if r.email:
                sinks.append(SINK_EMAIL)
            if r.external:
                sinks.append(SINK_EXTERNAL)
            for s in sinks:
                out[(s, sid)] = out.get((s, sid), 0) + n
        return out


def run_engine(ds, ruleset: RuleSet, lookups: Lookups | None = None,
               config: EngineConfig | None = None, *,
               concurrency=None, batch_size: int = 16384) -> EngineResult:
    """Build the lazy match pipeline over a transcript Dataset."""
    import ray

    config = config or EngineConfig()
    ruleset_ref = ray.put(ruleset)
    lookups_ref = ray.put(lookups or Lookups())

    if concurrency is None:
        # autoscaling actor pool: starts small (cheap for small inputs),
        # scales to the session CPUs minus headroom for the read and
        # shuffle stages so no stage starves (ray_guide actor-pool sizing)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu - 2))

    matches = ds.map_batches(
        RuleClassifier,
        fn_constructor_args=(ruleset_ref, lookups_ref, config),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    if ruleset.has_stateful:
        import numpy as _np
        import pandas as _pd

        # Single fully-pipelined path: every match row (stateless verdicts
        # already final) flows through ONE hash-bucketed shuffle; the
        # correlator replays stateful rows per conversation in
        # (turn_idx, rule_idx) order and passes stateless rows through
        # untouched. No materialize barrier, no branch/union double
        # consumption — read, classify, shuffle and correlate overlap
        # under the streaming executor.
        #
        # bucket count: enough for parallelism, few enough that each
        # map_groups call amortizes python overhead over many convs.
        # hash is pandas' stable siphash — deterministic across processes.
        n_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

        def add_bucket(t: pa.Table) -> pa.Table:
            conv = t.column("conv_id").to_numpy(zero_copy_only=False)
            b = (_pd.util.hash_array(conv.astype(object)) % n_buckets).astype(_np.int32)
            return t.append_column("bucket", pa.array(b))

        correlate = make_correlator(ruleset)

        def corr_wrapper(df):
            out = correlate(df)
            return out[_MATCH_COLS]  # stable column order

        matches = (matches.map_batches(add_bucket, batch_format="pyarrow")
                   .groupby("bucket")
                   .map_groups(corr_wrapper, batch_format="pandas")
                   # normalize the pandas round-trip back to MATCH_SCHEMA
                   .map_batches(lambda t: t.select(_MATCH_COLS).cast(MATCH_SCHEMA),
                                batch_format="pyarrow"))

    return EngineResult(matches=matches, ruleset=ruleset, config=config)


def input_counters(ds, config: EngineConfig | None = None) -> dict[str, int]:
    """One-pass input-side counters (the Statistics analog,
    reference src/stats.c:54-381): received / null_message / ignored /
    processed."""
    config = config or EngineConfig()

    def flags(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        nullm = pc.or_kleene(
            pc.is_null(text),
            pc.equal(pc.utf8_trim_whitespace(pc.fill_null(text, "")), ""))
        nullm = pc.fill_null(nullm, True)
        ign = pa.array([False] * len(tbl))
        for s in config.ignore_list:
            ign = pc.or_(ign, pc.fill_null(pc.match_substring(text, s), False))
        ign = pc.and_(pc.invert(nullm), ign)
        n = len(tbl)
        return pa.table({
            "received": pa.array([n], pa.int64()),
            "null_message": pa.array([int(pc.sum(nullm).as_py() or 0)], pa.int64()),
            "ignored": pa.array([int(pc.sum(ign).as_py() or 0)], pa.int64()),
        })

    import ray.data  # noqa: F401
    agg = ds.map_batches(flags, batch_format="pyarrow").to_pandas().sum()
    received = int(agg["received"])
    nullm = int(agg["null_message"])
    ignored = int(agg["ignored"])
    return {
        "events_received": received,
        "null_message": nullm,
        "ignored": ignored,
        "events_processed": received - nullm - ignored,
    }
