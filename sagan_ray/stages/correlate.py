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
