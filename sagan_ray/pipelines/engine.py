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
    def hit_counts(self) -> dict[int, int]:
        df = self.matches.groupby("sid").count().to_pandas()
        return dict(zip(df["sid"].astype(int), df["count()"].astype(int)))

    def routed_counts(self) -> dict[tuple[str, int], int]:
        df = self.routed_exploded().groupby(["sink", "sid"]).count().to_pandas()
        return {(s, int(sid)): int(n)
                for s, sid, n in zip(df["sink"], df["sid"], df["count()"])}


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
        import pyarrow.compute as _pc

        stateless = matches.map_batches(
            lambda t: t.filter(_pc.invert(t.column("stateful").combine_chunks())),
            batch_format="pyarrow")
        stateful = matches.map_batches(
            lambda t: t.filter(t.column("stateful").combine_chunks()),
            batch_format="pyarrow")
        correlate = make_correlator(ruleset)

        def corr_wrapper(df):
            out = correlate(df)
            return out[_MATCH_COLS]  # stable column order for the union

        corr = stateful.groupby("conv_id").map_groups(
            corr_wrapper, batch_format="pandas")
        # normalize the pandas round-trip back to MATCH_SCHEMA (int32 widths,
        # large_string) so the union has one schema
        corr = corr.map_batches(
            lambda t: t.select(_MATCH_COLS).cast(MATCH_SCHEMA),
            batch_format="pyarrow")
        matches = stateless.union(corr)

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
