"""Operational aggregate pipelines (SURVEY.md §2.4).

- client_stats: per-source rolling stats — events, bytes, first/last seen
  (reference src/processors/client-stats.c:112-364 Add_Update_IP).
- track_clients: sources that stopped reporting within a timeout window
  (reference src/processors/track-clients.c:78-331).
- rule_tracking: which rules fired / never fired
  (reference src/tracking-syslog.c:56-141).

All are single groupby jobs with vectorized per-batch pre-aggregation:
each batch emits one partial row per key, then a small shuffle combines
partials — the pre-aggregate pattern that keeps the all-to-all exchange
proportional to key cardinality, not row count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum


def client_stats(ds, key: str = "conv_id", text_col: str = "text",
                 ts_col: str = "ts"):
    """Per-key: n_events, bytes, first_seen, last_seen. Pre-aggregates
    per batch before the groupby shuffle."""

    def partial(tbl: pa.Table) -> pa.Table:
        b = pc.binary_length(pc.cast(tbl.column(text_col), pa.large_binary()))
        t = tbl.append_column("bytes", b)
        g = pa.TableGroupBy(t, key).aggregate([
            ("bytes", "sum"), (ts_col, "min"), (ts_col, "max"), ([], "count_all")])
        return g.rename_columns([key, "bytes", "first_seen", "last_seen", "n_events"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(key).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("bytes", alias_name="bytes"),
        Min("first_seen", alias_name="first_seen"),
        Max("last_seen", alias_name="last_seen"),
    )
    return out


def track_clients(ds, horizon_ts, *, timeout_seconds: int = 3600,
                  key: str = "conv_id", ts_col: str = "ts"):
    """Keys whose last event is older than ``horizon_ts - timeout``
    (stopped-logging detection). ``horizon_ts`` is event-time 'now' —
    deterministic, unlike the reference's wall clock."""
    last = client_stats(ds, key=key, ts_col=ts_col)

    def flag(tbl: pa.Table) -> pa.Table:
        import datetime as _dt

        cutoff = horizon_ts - _dt.timedelta(seconds=timeout_seconds)
        stopped = pc.less(tbl.column("last_seen"), pa.scalar(cutoff))
        return tbl.append_column("stopped", stopped)

    return last.map_batches(flag, batch_format="pyarrow")


def rule_tracking(engine_result):
    """Per-sid fired counts, anti-joined against the full rule list so
    never-fired rules appear with n_fired=0."""
    fired = engine_result.matches.groupby("sid").count().to_pandas()
    fired_map = dict(zip(fired["sid"].astype(int), fired["count()"].astype(int)))
    rows = [{"sid": r.sid, "msg": r.msg, "n_fired": int(fired_map.get(r.sid, 0)),
             "fired": r.sid in fired_map}
            for r in engine_result.ruleset]
    return pa.Table.from_pylist(rows)


def stats_snapshot(input_counts: dict, engine_result) -> dict:
    """stats.json analog (reference src/processors/stats-json.c:87-583):
    one merged counter snapshot."""
    hit_counts = engine_result.hit_counts()
    routed = engine_result.routed_counts()
    per_sink: dict[str, int] = {}
    for (sink, _sid), n in routed.items():
        per_sink[sink] = per_sink.get(sink, 0) + n
    return {
        **input_counts,
        "saganfound": int(sum(hit_counts.values())),
        "alerts_per_sink": per_sink,
        "rules_fired": len(hit_counts),
        "rules_total": len(engine_result.ruleset),
    }
