"""Vectorized stateless rule classification — the Ray Data analog of the
reference's per-record rule loop (/root/reference/src/processors/engine.c:
92-1558), restructured batch-first: every predicate family is evaluated as
a vectorized mask over the whole Arrow batch, per rule, with early exit
when a rule's mask empties. Expensive residual gates (IP extraction,
CIDR/intel lookups, JSON) run only on the rows that survived the cheap
text predicates — the batch equivalent of the reference's
cheapness-ordered short-circuit (doc/source/high-performance.rst:78-93).

Used as an actor pool: ``ds.map_batches(RuleClassifier, fn_constructor_args
=(ruleset_ref, lookups_ref, config), concurrency=N, batch_format="pyarrow")``
— rule compilation (regexes, window plans, lookup tables) happens once per
actor in ``__init__``, never per batch.

Output is the *exploded match table*: one row per (input row × stateless-
matched rule), tagged ``stateful`` when the rule touches correlation state
and therefore still needs the per-conv ordered pass
(sagan_ray.stages.correlate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, Lookups
from ..functions.ip import extract_ips, net_group_contains
from ..functions.textutil import (
    EVENT_ID_HEAD,
    extract_hashes,
    infer_proto,
    json_atom_match,
    prematch_regex,
    try_parse_json_text,
)
from ..rules.model import Rule, RuleSet

MATCH_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("rule_idx", pa.int32()),
    ("sid", pa.int64()),
    ("stateful", pa.bool_()),
    # emit: verdict for stateless rules (action==alert ⇒ route); for
    # stateful rules decided later by the correlation stage
    ("emit", pa.bool_()),
    # pass_conditional: this row hit a *stateful* pass rule, so every one
    # of its matches must be re-decided in rule order by the correlator
    ("pass_conditional", pa.bool_()),
    ("ts_epoch", pa.int64()),
    ("src_ip", pa.string()),
    ("dst_ip", pa.string()),
    ("src_port", pa.int32()),
    ("dst_port", pa.int32()),
    ("username", pa.string()),
    ("text", pa.large_string()),
    ("role", pa.string()),
    ("tool", pa.string()),
])


def _re2_ok(pattern: str) -> bool:
    """Can Arrow's RE2 handle this pattern? (pcre fallback decision)"""
    try:
        pc.match_substring_regex(pa.array([""]), pattern)
        return True
    except pa.lib.ArrowInvalid:
        return False


class _RulePlan:
    """Per-rule compiled evaluation plan (built once per actor)."""

    __slots__ = ("rule", "prematch_role", "prematch_tool", "meta_regexes",
                 "pcre_re2", "pcre_py", "needs_ips", "needs_json",
                 "needs_hashes", "slow_gates", "jm_fields")

    def __init__(self, rule: Rule):
        self.rule = rule
        self.prematch_role = prematch_regex(rule.program).pattern if rule.program else None
        tools = []
        if rule.facility:
            tools.append(prematch_regex(rule.facility).pattern)
        if rule.tag:
            tools.append(prematch_regex(rule.tag).pattern)
        self.prematch_tool = tools

        # meta_content → one RE2 alternation per atom
        self.meta_regexes = []
        for mc in rule.meta_contents:
            alt = "|".join(__import__("re").escape(p) for p in mc.patterns)
            rx = ("(?i)" if mc.nocase else "") + "(?:" + alt + ")"
            self.meta_regexes.append((rx, mc.negated))

        self.pcre_re2 = []       # (pattern_with_flags, negated)
        self.pcre_py = []        # (compiled, negated)
        for patom in rule.pcres:
            import re as _re
            rx = patom.pattern
            if patom.flags & _re.IGNORECASE:
                rx = "(?i)" + rx
            if patom.flags & _re.DOTALL:
                rx = "(?s)" + rx
            if patom.flags & _re.MULTILINE:
                rx = "(?m)" + rx
            if _re2_ok(rx):
                self.pcre_re2.append((rx, patom.negated))
            else:
                self.pcre_py.append((patom.compiled(), patom.negated))

        self.needs_ips = rule.needs_ips()
        self.needs_json = bool(rule.json_atoms)
        self.needs_hashes = bool(rule.parse_hash) or "file_hash" in rule.zeekintel
        self.jm_fields = {f for f, _ in rule.json_maps}
        # gates that require per-row python on the candidate subset.
        # The header flow gate (proto / src_port_eq / dst_port_eq,
        # evaluator.py:289-299) lives in _residual too, so any rule that
        # carries one must route through it even with no parse_* options —
        # e.g. `alert tcp any any -> any 22 (content:"x";)`.
        self.slow_gates = bool(
            self.needs_ips or rule.geoip_track or rule.blacklist
            or rule.zeekintel or rule.parse_hash or self.pcre_py
            or rule.json_maps or rule.normalize
            or rule.proto not in ("any", "syslog")
            or rule.src_port_eq is not None or rule.dst_port_eq is not None
        )


class RuleClassifier:
    """Actor-pool batch classifier. ``__init__`` once per actor (compiles
    the ruleset, loads broadcast lookups); ``__call__`` per Arrow batch."""

    def __init__(self, ruleset, lookups=None, config: EngineConfig | None = None):
        import ray

        if isinstance(ruleset, ray.ObjectRef):
            ruleset = ray.get(ruleset)
        if lookups is not None and isinstance(lookups, ray.ObjectRef):
            lookups = ray.get(lookups)
        self.ruleset: RuleSet = ruleset
        self.lookups: Lookups = lookups or Lookups()
        self.config = config or EngineConfig()
        self.plans = [_RulePlan(r) for r in ruleset]
        self.needs_username = any(
            (r.after and r.after.by_username) or
            (r.threshold and r.threshold.by_username) or
            any(f.direction == "username" for f in r.flexbits) or
            "user_name" in r.zeekintel or
            any(f == "username" for f, _ in r.json_maps)
            for r in ruleset)
        self.any_json = any(p.needs_json for p in self.plans) or self.needs_username
        # stateless pass rules truncate later hits with certainty
        self.stateless_pass_idx = [r.idx for r in ruleset
                                   if r.action == "pass" and not r.is_stateful]
        self.stateful_pass_idx = [r.idx for r in ruleset
                                  if r.action == "pass" and r.is_stateful]
        self._ip_memo: dict[str, object] = {}

    # ------------------------------------------------------------------
    def __call__(self, tbl: pa.Table) -> pa.Table:
        tbl = _drop_invalid(tbl, self.config)
        n = len(tbl)
        if n == 0:
            return MATCH_SCHEMA.empty_table()

        text_col = pc.cast(tbl.column("text").combine_chunks(), pa.large_string())
        role_np = pc.fill_null(tbl.column("role"), "").to_numpy(zero_copy_only=False)
        tool_np = pc.fill_null(tbl.column("tool"), "").to_numpy(zero_copy_only=False)
        ts_epoch = (tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 1_000_000)

        ctx = _BatchCtx(text_col, role_np, tool_np, ts_epoch)

        hit_rows: list[np.ndarray] = []
        hit_rules: list[int] = []
        for plan in self.plans:
            idx = self._eval_rule(plan, ctx, n)
            if idx is not None and len(idx):
                hit_rows.append(idx)
                hit_rules.append(plan.rule.idx)
        if not hit_rows:
            return MATCH_SCHEMA.empty_table()

        return self._explode(tbl, ctx, hit_rows, hit_rules)

    # ------------------------------------------------------------------
    def _eval_rule(self, plan: _RulePlan, ctx: "_BatchCtx", n: int):
        rule = plan.rule
        mask: np.ndarray | None = None  # None = all-true so far

        # ---- pre-match (engine.c:492-581) ----------------------------
        if plan.prematch_role is not None:
            mask = _and(mask, ctx.factor_mask("role", plan.prematch_role))
            if not mask.any():
                return None
        for rx in plan.prematch_tool:
            mask = _and(mask, ctx.factor_mask("tool", rx))
            if not mask.any():
                return None

        text = ctx.text(rule.append_program)

        # ---- content chain (src/content.c) ---------------------------
        prev_depth = 0
        for atom in rule.contents:
            start, stop = atom.window(prev_depth)
            col = ctx.sliced(rule.append_program, start, stop)
            m = pc.match_substring(col, atom.pattern,
                                   ignore_case=atom.nocase).to_numpy(zero_copy_only=False)
            m = m.astype(bool, copy=False)
            if atom.negated:
                m = ~m
            mask = _and(mask, m)
            if not mask.any():
                return None
            prev_depth = atom.depth

        # ---- meta_content (src/meta-content.c) -----------------------
        for rx, negated in plan.meta_regexes:
            m = pc.match_substring_regex(text, rx).to_numpy(zero_copy_only=False)
            m = m.astype(bool, copy=False)
            if negated:
                m = ~m
            mask = _and(mask, m)
            if not mask.any():
                return None

        # ---- pcre via RE2 (src/pcre-s.c) -----------------------------
        for rx, negated in plan.pcre_re2:
            m = pc.match_substring_regex(text, rx).to_numpy(zero_copy_only=False)
            m = m.astype(bool, copy=False)
            if negated:
                m = ~m
            mask = _and(mask, m)
            if not mask.any():
                return None

        # ---- event_id (src/event-id.c) -------------------------------
        # (deferred to the residual when json_map remaps event_id)
        if rule.event_ids and "event_id" not in plan.jm_fields:
            eids = ctx.event_ids()
            m = np.isin(eids, np.array(rule.event_ids, dtype=object))
            mask = _and(mask, m)
            if not mask.any():
                return None

        # ---- alert_time (src/aetas.c) --------------------------------
        if rule.alert_days is not None or rule.alert_hours is not None:
            m = np.ones(n, dtype=bool)
            if rule.alert_days is not None:
                m &= np.isin(ctx.dow(), list(rule.alert_days))
            if rule.alert_hours is not None:
                a, b = rule.alert_hours
                hh = ctx.hhmm()
                m &= ((a <= hh) & (hh <= b)) if a <= b else ((hh >= a) | (hh <= b))
            mask = _and(mask, m)
            if not mask.any():
                return None

        # json rules only ever match messages that ARE a JSON object —
        # vectorized prefilter before the per-row residual parse
        if plan.needs_json:
            mask = _and(mask, ctx.json_candidates())
            if not mask.any():
                return None

        # zeekintel text kinds (domain/url/software/file_name) are exact
        # substring scans of the message against small tables — fully
        # vectorizable, and they prefilter the residual for the other
        # kinds; a rule gated on file_hash can only match rows that
        # contain a 32+-char hex run
        if rule.zeekintel:
            for kind, table in (("domain", "domain"), ("url", "url"),
                                ("software", "software"), ("file_name", "filename")):
                if kind in rule.zeekintel:
                    vals = sorted(self.lookups.intel_set(table))
                    m = np.zeros(n, dtype=bool)
                    for v in vals:
                        m |= pc.match_substring(text, v).to_numpy(
                            zero_copy_only=False).astype(bool, copy=False)
                    mask = _and(mask, m)
                    if not mask.any():
                        return None
            if "file_hash" in rule.zeekintel:
                m = pc.match_substring_regex(text, r"[0-9a-fA-F]{32}").to_numpy(
                    zero_copy_only=False).astype(bool, copy=False)
                mask = _and(mask, m)
                if not mask.any():
                    return None

        if mask is None:
            mask = np.ones(n, dtype=bool)

        cand = np.flatnonzero(mask)

        # ---- residual python gates on the candidate subset -----------
        if plan.pcre_py or plan.needs_json or plan.slow_gates:
            cand = self._residual(plan, ctx, cand)
        return cand

    # ------------------------------------------------------------------
    def _residual(self, plan: _RulePlan, ctx: "_BatchCtx", cand: np.ndarray) -> np.ndarray:
        """Row-at-a-time gates for the (small) candidate subset: python-only
        pcre, json predicates, IP/CIDR/intel lookups. Mirrors the oracle
        evaluator exactly — sagan_ray.oracle.evaluator is the spec."""
        rule = plan.rule
        lk = self.lookups
        texts = ctx.texts_np()
        keep = []
        for i in cand:
            t = texts[i]
            msg = ctx.append_text_row(i) if rule.append_program else t

            ok = True
            for rx, negated in plan.pcre_py:
                if (rx.search(msg) is not None) == negated:
                    ok = False
                    break
            if not ok:
                continue

            if plan.needs_json:
                j = ctx.json_row(i)
                if j is None:
                    continue
                for ja in rule.json_atoms:
                    if json_atom_match(ja, j.get(ja.key)) == ja.negated:
                        ok = False
                        break
                if not ok:
                    continue

            # json_map overrides (engine.c:321-488)
            jm: dict[str, str] = {}
            if rule.json_maps:
                j = ctx.json_row(i)
                if j:
                    for fld, key in rule.json_maps:
                        v = j.get(key)
                        if v is not None:
                            jm[fld] = v
                if rule.event_ids:  # deferred event_id check
                    eid = jm.get("event_id", ctx.event_ids()[i])
                    if eid not in rule.event_ids:
                        continue

            # normalize base values (liblognormalize.c:105-264); json_map
            # overrides, positional extraction overwrites when it finds
            base = jm
            if rule.normalize and lk.normalize is not None:
                nm = ctx.norm_row(i, lk.normalize)
                if nm:
                    base = {**nm, **jm}

            src_ip, dst_ip, src_port, dst_port = _extract_fields(rule, ctx, i, base)

            proto = base.get("proto", "")
            if rule.parse_proto and not proto:
                proto = infer_proto(t)
            if not proto:
                proto = rule.default_proto

            # flow gate
            if rule.proto not in ("any", "syslog") and proto != rule.proto:
                continue
            if rule.src_nets is not None and not (
                    src_ip and net_group_contains(rule.src_nets, src_ip)):
                continue
            if rule.dst_nets is not None and not (
                    dst_ip and net_group_contains(rule.dst_nets, dst_ip)):
                continue
            if rule.src_port_eq is not None and src_port != rule.src_port_eq:
                continue
            if rule.dst_port_eq is not None and dst_port != rule.dst_port_eq:
                continue

            # geoip (unknown country ⇒ GEOIP_SKIP ⇒ fail, geoip.c:195-209)
            if rule.geoip_track:
                ip = src_ip if rule.geoip_track == "by_src" else dst_ip
                if not ip:
                    continue
                cc = lk.geo.lookup(ip) if lk.geo else None
                if cc is None:
                    continue
                if rule.geoip_isnot == (cc in rule.geoip_codes):
                    continue

            # blacklist
            if rule.blacklist:
                bl = lk.blacklist
                if bl is None:
                    continue
                mode = rule.blacklist
                if mode == "by_src":
                    hit = bool(src_ip) and src_ip in bl
                elif mode == "by_dst":
                    hit = bool(dst_ip) and dst_ip in bl
                elif mode == "both":
                    hit = bool(src_ip) and bool(dst_ip) and src_ip in bl and dst_ip in bl
                else:
                    hit = any(ip in bl for ip, _ in ctx.ips_row(i))
                if not hit:
                    continue

            # zeekintel (lazy: each kind fetches only the derivation it
            # actually needs — engine.c:1297-1360)
            if rule.zeekintel:
                if not _zeekintel_row(rule, lk, ctx, i, t, src_ip, dst_ip, base):
                    continue

            keep.append(i)
        return np.asarray(keep, dtype=np.int64)

    # ------------------------------------------------------------------
    def _explode(self, tbl: pa.Table, ctx: "_BatchCtx",
                 hit_rows: list[np.ndarray], hit_rules: list[int]) -> pa.Table:
        rules = self.ruleset.rules
        row_idx = np.concatenate(hit_rows)
        rule_idx = np.concatenate([
            np.full(len(rows), r, dtype=np.int32)
            for rows, r in zip(hit_rows, hit_rules)])

        # pass truncation: for each row, the smallest stateless-pass rule
        # idx that hit; matches with rule_idx beyond it are dead
        # (engine.c:1450-1453 first-match-wins)
        n = len(tbl)
        pass_cut = np.full(n, np.iinfo(np.int32).max, dtype=np.int64)
        for rows, r in zip(hit_rows, hit_rules):
            if r in self.stateless_pass_set:
                np.minimum.at(pass_cut, rows, r)
        alive = rule_idx <= pass_cut[row_idx]
        row_idx, rule_idx = row_idx[alive], rule_idx[alive]

        # rows that hit a *stateful* pass rule → every later match of the
        # row is conditional; route the whole row through the correlator
        pass_cond = np.zeros(n, dtype=bool)
        for rows, r in zip(hit_rows, hit_rules):
            if r in self.stateful_pass_set:
                pass_cond[rows] = True
        pc_flag = pass_cond[row_idx]

        order = np.lexsort((rule_idx, row_idx))
        row_idx, rule_idx, pc_flag = row_idx[order], rule_idx[order], pc_flag[order]

        sids = np.array([r.sid for r in rules], dtype=np.int64)[rule_idx]
        stateful = np.array([r.is_stateful for r in rules], dtype=bool)[rule_idx] | pc_flag
        emits = np.array([r.action == "alert" and not (r.flexbits and r.flexbit_noalert)
                          for r in rules], dtype=bool)[rule_idx]
        emits = emits & ~stateful  # stateful verdicts decided by correlator

        # per-hit extracted fields (rule-specific positional picks); only
        # rules that pick positions / defaults pay the python loop
        m = len(row_idx)
        src_ips = [""] * m
        dst_ips = [""] * m
        src_ports = np.zeros(m, dtype=np.int32)
        dst_ports = np.zeros(m, dtype=np.int32)
        usernames = [""] * m
        need_extract = [bool(r.parse_src_ip or r.parse_dst_ip
                             or r.default_src_port or r.default_dst_port
                             or r.json_maps or r.normalize)
                        for r in rules]
        norm_table = self.lookups.normalize
        if any(need_extract) or self.needs_username:
            for k in range(m):
                ri = rule_idx[k]
                i = row_idx[k]
                r_obj = rules[ri]
                jm: dict = {}
                if r_obj.json_maps:
                    j = ctx.json_row(i)
                    if j:
                        for fld, key in r_obj.json_maps:
                            v = j.get(key)
                            if v is not None:
                                jm[fld] = v
                base = jm
                if r_obj.normalize and norm_table is not None:
                    nm = ctx.norm_row(i, norm_table)
                    if nm:
                        base = {**nm, **jm}
                if need_extract[ri]:
                    s, d, sp, dp = _extract_fields(r_obj, ctx, i, base)
                    src_ips[k], dst_ips[k] = s, d
                    src_ports[k], dst_ports[k] = sp, dp
                if self.needs_username:
                    usernames[k] = base.get("username") or ctx.username_row(i)

        take = pa.array(row_idx, pa.int64())
        return pa.Table.from_arrays([
            tbl.column("conv_id").take(take).combine_chunks(),
            tbl.column("turn_idx").take(take).combine_chunks(),
            pa.array(rule_idx, pa.int32()),
            pa.array(sids, pa.int64()),
            pa.array(stateful, pa.bool_()),
            pa.array(emits, pa.bool_()),
            pa.array(pc_flag, pa.bool_()),
            pa.array(ctx.ts_epoch[row_idx], pa.int64()),
            pa.array(src_ips, pa.string()),
            pa.array(dst_ips, pa.string()),
            pa.array(src_ports, pa.int32()),
            pa.array(dst_ports, pa.int32()),
            pa.array(usernames, pa.string()),
            pc.cast(tbl.column("text").take(take).combine_chunks(), pa.large_string()),
            tbl.column("role").take(take).combine_chunks(),
            tbl.column("tool").take(take).combine_chunks(),
        ], schema=MATCH_SCHEMA)

    @property
    def stateless_pass_set(self):
        s = getattr(self, "_slp", None)
        if s is None:
            s = self._slp = set(self.stateless_pass_idx)
        return s

    @property
    def stateful_pass_set(self):
        s = getattr(self, "_sfp", None)
        if s is None:
            s = self._sfp = set(self.stateful_pass_idx)
        return s


# ----------------------------------------------------------------------
# batch context: shared lazily-computed derivations (the batch analog of
# the reference's per-record Parse_IP cache, engine.c:800-843)
# ----------------------------------------------------------------------

class _BatchCtx:
    def __init__(self, text_col: pa.ChunkedArray, role_np, tool_np, ts_epoch):
        self._text = text_col
        self.role_np = role_np
        self.tool_np = tool_np
        self.ts_epoch = ts_epoch
        self._texts_np = None
        self._append = None
        self._slices: dict = {}
        self._factor: dict = {}
        self._eids = None
        self._dow = None
        self._hhmm = None
        self._ips: dict = {}
        self._hashes: dict = {}
        self._json: dict = {}
        self._norm: dict = {}

    def text(self, append_program: bool):
        if not append_program:
            return self._text
        if self._append is None:
            role = pa.array(self.role_np, pa.large_string())
            self._append = pc.binary_join_element_wise(
                self._text, role, pa.scalar(" | ", pa.large_string()))
        return self._append

    def texts_np(self):
        if self._texts_np is None:
            self._texts_np = self._text.to_numpy(zero_copy_only=False)
        return self._texts_np

    def append_text_row(self, i: int) -> str:
        return f"{self.texts_np()[i]} | {self.role_np[i]}"

    def sliced(self, append_program: bool, start: int, stop):
        key = (append_program, start, stop)
        col = self._slices.get(key)
        if col is None:
            base = self.text(append_program)
            if start == 0 and stop is None:
                col = base
            elif stop is None:
                col = pc.utf8_slice_codeunits(base, start=start)
            else:
                col = pc.utf8_slice_codeunits(base, start=start, stop=stop)
            self._slices[key] = col
        return col

    def factor_mask(self, which: str, regex: str) -> np.ndarray:
        """Anchored-regex mask over a low-cardinality column, computed on
        the unique values only."""
        key = (which, regex)
        m = self._factor.get(key)
        if m is None:
            import re as _re

            arr = self.role_np if which == "role" else self.tool_np
            uniq, codes = np.unique(arr.astype(str), return_inverse=True)
            rx = _re.compile(regex)
            um = np.array([rx.match(u) is not None for u in uniq], dtype=bool)
            m = um[codes]
            self._factor[key] = m
        return m

    def event_ids(self) -> np.ndarray:
        if self._eids is None:
            # vectorized head-window id extract (event-id.c:61-125):
            # RE2 over the first 12 chars, then enforce the 10-char window
            head = pc.utf8_slice_codeunits(self._text, start=0, stop=12)
            ext = pc.extract_regex(head, r"(?P<pre>^|.*?\s)(?P<eid>\d{1,10}):")
            pre = pc.struct_field(ext, "pre").to_numpy(zero_copy_only=False)
            eid = pc.struct_field(ext, "eid").to_numpy(zero_copy_only=False)
            out = np.empty(len(eid), dtype=object)
            for i in range(len(eid)):
                e = eid[i]
                out[i] = e if e is not None and len(pre[i]) <= EVENT_ID_HEAD else ""
            # oracle fallback (evaluator.py:226-228): when head extraction
            # fails and the message is a JSON object, use its flattened
            # `.event_id` key. Only JSON-candidate rows pay the parse —
            # try_parse_json_text rejects non-'{' texts anyway.
            for i in np.flatnonzero(self.json_candidates()):
                if not out[i]:
                    j = self.json_row(i)
                    if j is not None:
                        out[i] = j.get(".event_id", "")
            self._eids = out
        return self._eids

    def json_candidates(self) -> np.ndarray:
        m = getattr(self, "_json_cand", None)
        if m is None:
            m = pc.starts_with(pc.utf8_ltrim_whitespace(self._text), "{").to_numpy(
                zero_copy_only=False).astype(bool, copy=False)
            self._json_cand = m
        return m

    def dow(self) -> np.ndarray:
        if self._dow is None:
            # 1970-01-01 was a Thursday; reference aetas uses 0=Sunday
            self._dow = ((self.ts_epoch // 86400) + 4) % 7
        return self._dow

    def hhmm(self) -> np.ndarray:
        if self._hhmm is None:
            sec = self.ts_epoch % 86400
            self._hhmm = (sec // 3600) * 100 + (sec % 3600) // 60
        return self._hhmm

    def ips_row(self, i: int):
        v = self._ips.get(i)
        if v is None:
            v = self._ips[i] = extract_ips(self.texts_np()[i])
        return v

    def hashes_row(self, i: int):
        v = self._hashes.get(i)
        if v is None:
            v = self._hashes[i] = extract_hashes(self.texts_np()[i])
        return v

    def json_row(self, i: int):
        if i not in self._json:
            self._json[i] = try_parse_json_text(self.texts_np()[i])
        return self._json[i]

    def norm_row(self, i: int, table) -> dict:
        v = self._norm.get(i)
        if v is None:
            v = self._norm[i] = table.apply(self.texts_np()[i])
        return v

    def username_row(self, i: int) -> str:
        j = self.json_row(i)
        return j.get(".username", "") if j else ""


# ----------------------------------------------------------------------

def _and(mask, m):
    return m if mask is None else (mask & m)


def _drop_invalid(tbl: pa.Table, config: EngineConfig) -> pa.Table:
    """ValidateMessage + ignore-list pre-filter (src/util.c:1383,
    src/ignore.c:40-56) — cheap short-circuit before rule evaluation."""
    text = tbl.column("text")
    ok = pc.and_kleene(
        pc.is_valid(text),
        pc.not_equal(pc.utf8_trim_whitespace(text), ""))
    ok = pc.fill_null(ok, False)
    for s in config.ignore_list:
        ok = pc.and_(ok, pc.invert(pc.fill_null(pc.match_substring(text, s), False)))
    return tbl.filter(ok)


def _to_port(v) -> int:
    try:
        p = int(v)
        return p if 0 < p <= 65535 else 0
    except (TypeError, ValueError):
        return 0


def _extract_fields(rule: Rule, ctx: _BatchCtx, i: int,
                    jm: dict | None = None):
    """Per-rule positional IP/port extraction (engine.c:791-921), starting
    from json_map base values; extraction overwrites only when it finds
    something. Only rules that pick a position pay the regex."""
    jm = jm or {}
    src_ip = jm.get("src_ip", "")
    dst_ip = jm.get("dst_ip", "")
    src_port = _to_port(jm.get("src_port"))
    dst_port = _to_port(jm.get("dst_port"))
    if rule.parse_src_ip or rule.parse_dst_ip:
        ips = ctx.ips_row(i)
        if rule.parse_src_ip and rule.parse_src_ip <= len(ips):
            src_ip, p = ips[rule.parse_src_ip - 1]
            if rule.parse_port and p:
                src_port = p
        if rule.parse_dst_ip and rule.parse_dst_ip <= len(ips):
            dst_ip, p = ips[rule.parse_dst_ip - 1]
            if rule.parse_port and p:
                dst_port = p
    if src_port == 0:
        src_port = rule.default_src_port
    if dst_port == 0:
        dst_port = rule.default_dst_port
    return src_ip, dst_ip, src_port, dst_port


def _zeekintel_row(rule: Rule, lk: Lookups, ctx: _BatchCtx, i: int,
                   text: str, src_ip: str, dst_ip: str,
                   jm: dict | None = None) -> bool:
    ipset = lk.intel_set("ip")
    for kind in rule.zeekintel:
        if kind == "src_ipaddr":
            ok = src_ip in ipset
        elif kind == "dst_ipaddr":
            ok = dst_ip in ipset
        elif kind == "both":
            ok = src_ip in ipset and dst_ip in ipset
        elif kind == "all":
            ok = any(ip in ipset for ip, _ in ctx.ips_row(i))
        elif kind == "file_hash":
            hs = lk.intel_set("hash")
            ok = any(h and h in hs for h in ctx.hashes_row(i).values())
        elif kind == "domain":
            ok = any(v in text for v in lk.intel_set("domain"))
        elif kind == "url":
            ok = any(v in text for v in lk.intel_set("url"))
        elif kind == "software":
            ok = any(v in text for v in lk.intel_set("software"))
        elif kind == "user_name":
            u = (jm or {}).get("username") or ctx.username_row(i)
            ok = u in lk.intel_set("username") if u else False
        elif kind == "file_name":
            ok = any(v in text for v in lk.intel_set("filename"))
        else:
            ok = False
        if not ok:
            return False
    return True
