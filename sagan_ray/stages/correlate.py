"""Per-conversation ordered correlation — the stateful tail of the rule
cascade: xbit/flexbit conditions & sets, ``after``, ``threshold``, and the
pass short-circuit when it depends on state.

Reference semantics: src/xbit-mmap.c (set 60-175, condition 181-408),
src/flexbit-mmap.c (condition 66-843, count 851-918, set 925-1639),
src/after.c:51-229, src/threshold.c:54-234, applied in engine order
engine.c:1370-1453. The reference shares this state across all threads via
mmap; here state is scoped per ``conv_id`` (SURVEY.md §4.3 — the track
fields ≙ conv_id) and rows are replayed in ``(turn_idx, rule_idx)`` order
inside ``groupby("conv_id").map_groups``, which makes the verdicts exact
and deterministic instead of arrival-order-approximate.

Only *matched* rows of *stateful* rules flow through this stage (the
classify stage already decided every stateless predicate), so the shuffle
this groupby implies moves a small fraction of the input. Skew note: a
conversation's stateful matches all land in one group; the classify-side
reduction bounds group size, and pathological convs degrade to one
sequential task without blocking other groups.
"""

from __future__ import annotations

import pandas as pd

from ..rules.model import RuleSet
from ..oracle.evaluator import ReferenceEvaluator, _ConvState


def make_correlator(ruleset: RuleSet):
    """Build the map_groups callable. The ruleset rides the closure (small,
    broadcast by Ray once per task)."""

    # Reuse the oracle's state-machine primitives so the correlation
    # semantics have exactly one implementation to diverge from (the
    # stateless half is what the vectorized classifier re-implements).
    helper = ReferenceEvaluator(ruleset)

    # per-rule static predicates, computed once — not re-scanned per row
    # in the ~1M-row replay loop
    rule_static = [
        (any(x.op in ("set", "unset") for x in r.xbits),
         [f for f in r.flexbits if f.op in ("isset", "isnotset")],
         [f for f in r.flexbits if f.op == "count"])
        for r in ruleset.rules]

    def correlate(df: pd.DataFrame,
                  init_states: dict | None = None,
                  out_states: dict | None = None) -> pd.DataFrame:
        """Processes a block that may hold MANY conversations (bucketed by
        hash(conv_id)): rows are sorted by (conv_id, turn_idx, rule_idx)
        and per-conv state resets at each conv boundary — one python call
        per bucket instead of one per conversation."""
        df = df.sort_values(["conv_id", "turn_idx", "rule_idx"], kind="mergesort")
        st = _ConvState()
        rules = ruleset.rules

        routed_flags = []    # per input record: is it a hit (routing passed)?
        emit_flags = []      # per input record: does it alert (post-suppression)?

        conv_ids = df["conv_id"].to_numpy()
        rule_idx = df["rule_idx"].to_numpy()
        turn_idx = df["turn_idx"].to_numpy()
        stateful_f = df["stateful"].to_numpy()
        emit_in = df["emit"].to_numpy()
        ts_epoch = df["ts_epoch"].to_numpy()
        src_ips = df["src_ip"].to_numpy()
        dst_ips = df["dst_ip"].to_numpy()
        src_ports = df["src_port"].to_numpy()
        dst_ports = df["dst_port"].to_numpy()
        usernames = df["username"].to_numpy()

        class _Res:  # counter sink for the helper methods
            counters = {"after_total": 0, "threshold_total": 0}

        res = _Res()
        skip_turn = -1  # pass short-circuit: skip remaining matches of turn
        cur_conv = None
        for k in range(len(df)):
            if conv_ids[k] != cur_conv:
                if out_states is not None and cur_conv is not None:
                    out_states[cur_conv] = st
                cur_conv = conv_ids[k]
                # checkpoint resume: continue a conversation's state from a
                # prior incremental run (the mmap-persistence analog,
                # reference src/ipc.c:458-733); requires later runs to
                # carry strictly later turn_idx for the conv
                st = (init_states or {}).get(cur_conv) or _ConvState()
                skip_turn = -1
            if not stateful_f[k]:
                # stateless verdict is already final (classify stage);
                # pass-through — such rows never touch state, and any row
                # whose fate depends on a stateful pass rule was flagged
                # stateful wholesale by the classifier
                routed_flags.append(True)
                emit_flags.append(bool(emit_in[k]))
                continue
            t = int(turn_idx[k])
            if t == skip_turn:
                routed_flags.append(False)
                emit_flags.append(False)
                continue
            ri = int(rule_idx[k])
            rule = rules[ri]
            has_setunset, conds, counts = rule_static[ri]
            now = int(ts_epoch[k])
            src_ip, dst_ip = src_ips[k], dst_ips[k]
            sp, dp = int(src_ports[k]), int(dst_ports[k])
            user = usernames[k]

            # ---- state conditions (routing gates) --------------------
            routed = True
            if rule.xbits and not has_setunset:
                routed = helper._xbit_condition(rule, st, src_ip, dst_ip, now)
            if routed and rule.flexbits:
                if conds and not helper._flexbit_condition(
                        conds, st, src_ip, dst_ip, sp, dp, user, now):
                    routed = False
                if routed and counts and not all(
                        helper._flexbit_count(f, st, src_ip, dst_ip, now)
                        for f in counts):
                    routed = False

            if not routed:
                routed_flags.append(False)
                emit_flags.append(False)
                continue

            routed_flags.append(True)  # saganfound analog

            # ---- after / threshold ----------------------------------
            after_flag = False
            if rule.after is not None:
                after_flag = helper._after(rule, st, src_ip, dst_ip, sp, dp,
                                           user, now, res)
            thresh_flag = False
            if rule.threshold is not None and not after_flag:
                thresh_flag = helper._threshold(rule, st, src_ip, dst_ip, sp,
                                                dp, user, now, res)
            if after_flag or thresh_flag:
                emit_flags.append(False)
                continue

            # ---- sets ------------------------------------------------
            if has_setunset:
                helper._xbit_set(rule, st, src_ip, dst_ip, now)
            for f in rule.flexbits:
                if f.op == "set":
                    helper._flexbit_set(f, st, src_ip, dst_ip, sp, dp, user, now)
                elif f.op == "unset":
                    helper._flexbit_unset(f, st, src_ip, dst_ip, sp, dp, user)

            if rule.action == "pass":
                emit_flags.append(False)
                skip_turn = t
                continue

            noalert = bool(rule.flexbits) and rule.flexbit_noalert
            emit_flags.append(rule.action == "alert" and not noalert)

        if out_states is not None and cur_conv is not None:
            out_states[cur_conv] = st

        out = df.copy()
        out["routed"] = routed_flags
        out["emit"] = emit_flags
        # keep only hits (routing passed): these are the saganfound records
        return out[out["routed"]].drop(columns=["routed"])

    return correlate


def correlate_group_fn(ruleset: RuleSet):
    return make_correlator(ruleset)


def make_arrow_correlator(ruleset: RuleSet):
    """Arrow-native variant for the exchange reduce side: sorts the bucket
    table with an Arrow kernel and runs the state machine over numpy views
    of the key/meta columns only — the (large) ``text`` column is never
    materialized as Python objects; survivors are selected with ``take``.
    Semantics identical to make_correlator (delegates to the same machine
    via a shared row loop against the oracle helpers)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    pandas_correlate = make_correlator(ruleset)

    def correlate_tbl(tbl: pa.Table, init_states=None, out_states=None) -> pa.Table:
        if len(tbl) == 0:
            return tbl
        idx = pc.sort_indices(
            tbl, sort_keys=[("conv_id", "ascending"),
                            ("turn_idx", "ascending"),
                            ("rule_idx", "ascending")])
        tbl = tbl.take(idx)
        # pandas frame over the SMALL columns only (text/role/tool excluded)
        import pandas as pd

        small_cols = ["conv_id", "turn_idx", "rule_idx", "ts_epoch",
                      "src_ip", "dst_ip", "src_port", "dst_port",
                      "username", "stateful", "emit"]
        df = tbl.select(small_cols).to_pandas()
        out = pandas_correlate(df, init_states=init_states,
                               out_states=out_states)
        keep = np.asarray(out.index, dtype=np.int64)
        kept = tbl.take(pa.array(np.sort(keep)))
        emit_by_pos = pd.Series(out["emit"].to_numpy(), index=out.index)
        emit_sorted = emit_by_pos.loc[np.sort(keep)].to_numpy()
        return kept.set_column(kept.schema.get_field_index("emit"), "emit",
                               pa.array(emit_sorted.astype(bool)))

    return correlate_tbl


def make_list_correlator(ruleset: RuleSet):
    """List-form variant for the exchange reduce side (input/output
    ``stages.classify.LIST_MATCH_SCHEMA`` — one row per matched turn ×
    class, per-match list columns). Only the SMALL columns flatten into
    the replay frame; the (large) ``text`` column is never exploded —
    survivors regroup into list rows keyed by their input row, so each
    surviving turn's text crosses the object store once regardless of how
    many of its rules survive. Semantics delegate to the same
    ``make_correlator`` state machine as the exploded variant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from .classify import LIST_MATCH_SCHEMA

    pandas_correlate = make_correlator(ruleset)

    def correlate_lists(tbl: pa.Table, init_states=None, out_states=None) -> pa.Table:
        if len(tbl) == 0:
            return tbl
        cols = {n: tbl.column(n).combine_chunks() for n in tbl.column_names}
        lens = pc.list_value_length(cols["rule_idx"]).to_numpy().astype(np.int64)
        parent = np.repeat(np.arange(len(tbl), dtype=np.int64), lens)

        def rep_np(name):
            return cols[name].to_numpy(zero_copy_only=False)[parent]

        def flat_np(name):
            return pc.list_flatten(cols[name]).to_numpy(zero_copy_only=False)

        # exploded SMALL frame in parent-major order (matches within a
        # row already rule_idx-ascending from the classify emit; the
        # correlator sorts by (conv, turn, rule) itself and reports
        # survivors by THIS frame's positions)
        df = pd.DataFrame({
            "conv_id": rep_np("conv_id"),
            "turn_idx": rep_np("turn_idx"),
            "rule_idx": flat_np("rule_idx"),
            "ts_epoch": rep_np("ts_epoch"),
            "src_ip": flat_np("src_ip"),
            "dst_ip": flat_np("dst_ip"),
            "src_port": flat_np("src_port"),
            "dst_port": flat_np("dst_port"),
            "username": flat_np("username"),
            "stateful": rep_np("stateful"),
            "emit": flat_np("emit"),
        })
        out = pandas_correlate(df, init_states=init_states,
                               out_states=out_states)
        keep = np.sort(np.asarray(out.index, dtype=np.int64))
        if len(keep) == 0:
            return LIST_MATCH_SCHEMA.empty_table()
        emit_by_pos = pd.Series(out["emit"].to_numpy(), index=out.index)
        emit_sorted = emit_by_pos.loc[keep].to_numpy().astype(bool)

        # regroup survivors by parent row (parent is globally
        # non-decreasing, so sorted ``keep`` keeps runs contiguous and
        # preserves within-turn rule order)
        p = parent[keep]
        starts = np.flatnonzero(np.concatenate(([True], p[1:] != p[:-1])))
        offsets = pa.array(
            np.concatenate((starts, [len(p)])).astype(np.int32))
        take_rows = pa.array(p[starts], pa.int64())
        keep_arr = pa.array(keep, pa.int64())

        def lst(name):
            return pa.ListArray.from_arrays(
                offsets, pc.list_flatten(cols[name]).take(keep_arr))

        return pa.Table.from_arrays([
            cols["conv_id"].take(take_rows),
            cols["turn_idx"].take(take_rows),
            cols["stateful"].take(take_rows),
            cols["pass_conditional"].take(take_rows),
            cols["ts_epoch"].take(take_rows),
            lst("rule_idx"), lst("sid"),
            pa.ListArray.from_arrays(offsets, pa.array(emit_sorted, pa.bool_())),
            lst("src_ip"), lst("dst_ip"), lst("src_port"), lst("dst_port"),
            lst("username"),
            cols["text"].take(take_rows),
            cols["role"].take(take_rows),
            cols["tool"].take(take_rows),
        ], schema=LIST_MATCH_SCHEMA)

    return correlate_lists
