"""Single-threaded reference evaluator — the executable spec.

A direct row-at-a-time transcription of the reference engine's predicate
cascade (/root/reference/src/processors/engine.c:92-1558, order documented
in doc/source/high-performance.rst:78-93):

    pre-match (program/facility/tag) → content → meta_content → pcre →
    event_id → json_* → field extraction → flow / geoip / blacklist /
    zeekintel gates → xbit/flexbit conditions → alert_time → routing
    conjunction (src/routing.c:43-158) → after (src/after.c:51-229) →
    threshold (src/threshold.c:54-234) → xbit/flexbit set
    (src/xbit-mmap.c:60-175, flexbit-mmap.c:925-1639) → emit → pass break
    (engine.c:1450-1453).

Transcript mapping: program≙role, facility/tag≙tool, message≙text; all
correlation state is scoped per ``conv_id`` and rows are processed in
``(conv_id, turn_idx)`` order — the deterministic analog of the
reference's global arrival-order shared-mmap state (SURVEY.md §4.3).
Event-time (the ``ts`` column) replaces wall-clock throughout.

The Ray Data pipeline (sagan_ray.pipelines.engine) must produce identical
hits / routed sets / counters; pytest enforces this.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from ..config import (
    SINK_EMAIL,
    SINK_EXTERNAL,
    EngineConfig,
    Lookups,
)
from ..functions.ip import extract_ips, net_group_contains
from ..functions.textutil import (
    extract_event_id,
    extract_hashes,
    infer_proto,
    json_atom_match,
    prematch_regex,
    try_parse_json_text,
)
from ..rules.model import Rule, RuleSet

_EPOCH = datetime(1970, 1, 1)


def _to_port(v) -> int:
    try:
        p = int(v)
        return p if 0 < p <= 65535 else 0
    except (TypeError, ValueError):
        return 0


def ts_epoch(ts) -> int:
    """Event-time epoch seconds from a (tz-naive, UTC) timestamp."""
    if isinstance(ts, (int, float)):
        return int(ts)
    return int((ts - _EPOCH).total_seconds())


@dataclass
class EvalResult:
    # saganfound analog: routed matches before after/threshold suppression
    hits: list[tuple[str, int, int]] = field(default_factory=list)       # (conv_id, turn_idx, sid)
    # post-suppression alerts fanned out per sink
    routed: list[tuple[str, int, str, int]] = field(default_factory=list)  # (sink, sid, conv_id, turn_idx)
    counters: dict[str, int] = field(default_factory=dict)

    def hit_counts(self) -> dict[int, int]:
        out: dict[int, int] = {}
        for _, _, sid in self.hits:
            out[sid] = out.get(sid, 0) + 1
        return out

    def routed_counts(self) -> dict[tuple[str, int], int]:
        out: dict[tuple[str, int], int] = {}
        for sink, sid, _, _ in self.routed:
            out[(sink, sid)] = out.get((sink, sid), 0) + 1
        return out


class _ConvState:
    """Per-conversation correlation state (the mmap-file analog,
    reference src/ipc.c:458-733)."""

    __slots__ = ("xbits", "flexbits", "after", "threshold")

    def __init__(self):
        # (name, trackkey) → expire_epoch (0 = unset; xbit-mmap.c:168)
        self.xbits: dict[tuple[str, str], int] = {}
        # entries: [name, src, dst, sport, dport, username, expire_epoch]
        self.flexbits: list[list] = []
        # (sid, trackkey) → [count, utime]
        self.after: dict[tuple[int, str], list[int]] = {}
        self.threshold: dict[tuple[int, str], list[int]] = {}


class ReferenceEvaluator:
    def __init__(self, ruleset: RuleSet, lookups: Lookups | None = None,
                 config: EngineConfig | None = None):
        self.ruleset = ruleset
        self.lookups = lookups or Lookups()
        self.config = config or EngineConfig()
        self._prematch_cache: dict[str, object] = {}

    # ------------------------------------------------------------------
    def evaluate(self, rows: list[dict]) -> EvalResult:
        """rows: dicts with conv_id, turn_idx, role, text, tool, ts.
        Processing order is (conv_id, turn_idx) — the spec's ordering
        contract (SURVEY.md §4.3)."""
        res = EvalResult()
        c = res.counters
        for k in ("events_received", "events_processed", "null_message", "ignored",
                  "saganfound", "after_total", "threshold_total", "alert_total"):
            c[k] = 0

        states: dict[str, _ConvState] = {}
        for row in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            c["events_received"] += 1
            text = row["text"]
            if text is None or text.strip() == "":
                # ValidateMessage analog (src/util.c:1383)
                c["null_message"] += 1
                continue
            if any(s in text for s in self.config.ignore_list):
                # droplist pre-filter (src/ignore.c:40-56)
                c["ignored"] += 1
                continue
            c["events_processed"] += 1
            st = states.setdefault(row["conv_id"], _ConvState())
            self._eval_row(row, st, res)
        return res

    # ------------------------------------------------------------------
    def _prematch(self, spec: str, value: str) -> bool:
        rx = self._prematch_cache.get(spec)
        if rx is None:
            rx = prematch_regex(spec)
            self._prematch_cache[spec] = rx
        return rx.match(value or "") is not None

    def _eval_row(self, row: dict, st: _ConvState, res: EvalResult) -> None:
        text: str = row["text"]
        role: str = row.get("role") or ""
        tool: str = row.get("tool") or ""
        now = ts_epoch(row["ts"])

        # lazy per-row derivations (computed once, reused across rules —
        # the analog of the reference's per-record Parse_IP cache,
        # engine.c:800-843)
        ips = None
        hashes = None
        event_id = None
        proto_inferred = None
        norm = None     # normalization result, computed once per row
                        # (liblognormalize.c runs once per record too)

        for rule in self.ruleset:
            # ---- pre-match -------------------------------------------
            if rule.program is not None and not self._prematch(rule.program, role):
                continue
            if rule.facility is not None and not self._prematch(rule.facility, tool):
                continue
            if rule.tag is not None and not self._prematch(rule.tag, tool):
                continue

            # append_program: engine.c:595-627
            msg = f"{text} | {role}" if rule.append_program else text

            # json_map field overrides (engine.c:321-488): applied before
            # the per-field checks below; absent keys leave the field to
            # normal extraction
            jm: dict[str, str] = {}
            if rule.json_maps:
                j = self._json(text)
                if j:
                    for fld, key in rule.json_maps:
                        v = j.get(key)
                        if v is not None:
                            jm[fld] = v

            # ---- content chain ---------------------------------------
            ok = True
            prev_depth = 0
            for atom in rule.contents:
                start, stop = atom.window(prev_depth)
                win = msg[start:stop]
                if atom.nocase:
                    found = atom.pattern.lower() in win.lower()
                else:
                    found = atom.pattern in win
                if found == atom.negated:
                    ok = False
                    break
                prev_depth = atom.depth
            if not ok:
                continue

            # ---- meta_content (OR-list, src/meta-content.c:159-224) --
            for mc in rule.meta_contents:
                if mc.nocase:
                    low = msg.lower()
                    found = any(p.lower() in low for p in mc.patterns)
                else:
                    found = any(p in msg for p in mc.patterns)
                if found == mc.negated:
                    ok = False
                    break
            if not ok:
                continue

            # ---- pcre (AND, src/pcre-s.c:39-68) ----------------------
            for pa in rule.pcres:
                found = pa.compiled().search(msg) is not None
                if found == pa.negated:
                    ok = False
                    break
            if not ok:
                continue

            # ---- event_id (src/event-id.c:61-125) --------------------
            if rule.event_ids:
                if event_id is None:
                    event_id = extract_event_id(text)
                    if not event_id and (j := self._json(text)) is not None:
                        event_id = j.get(".event_id", "")
                if jm.get("event_id", event_id) not in rule.event_ids:
                    continue

            # ---- json_* ----------------------------------------------
            if rule.json_atoms:
                j = self._json(text)
                if j is None:
                    continue  # no JSON ⇒ missing key ⇒ no match
                for ja in rule.json_atoms:
                    if json_atom_match(ja, j.get(ja.key)) == ja.negated:
                        ok = False
                        break
                if not ok:
                    continue

            # ---- normalize (liblognormalize.c:105-264): rules with the
            # `normalize` option see the rulebase-extracted fields as base
            # values; json_map overrides them, positional extraction
            # overwrites only when it finds something ------------------
            base = jm
            if rule.normalize and self.lookups.normalize is not None:
                if norm is None:
                    norm = self.lookups.normalize.apply(text)
                if norm:
                    base = {**norm, **jm}

            # ---- field extraction (engine.c:791-921; json_map/normalize
            # base values overwritten only when extraction finds
            # something) ------------------------------------------------
            src_ip = base.get("src_ip", "")
            dst_ip = base.get("dst_ip", "")
            src_port = _to_port(base.get("src_port"))
            dst_port = _to_port(base.get("dst_port"))
            if rule.needs_ips():
                if ips is None:
                    ips = extract_ips(text)
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

            proto = base.get("proto", "")
            if rule.parse_proto and not proto:
                if proto_inferred is None:
                    proto_inferred = infer_proto(text)
                proto = proto_inferred
            if not proto:
                proto = rule.default_proto

            hsh = ""
            if rule.parse_hash:
                hsh = base.get(rule.parse_hash, "")
                if not hsh:
                    if hashes is None:
                        hashes = extract_hashes(text)
                    hsh = hashes.get(rule.parse_hash, "")

            username = base.get("username", "")
            if not username:
                j = self._json(text)
                if j is not None:
                    username = j.get(".username", "")

            # ---- flow gate (src/flow.c, engine.c:926-940) ------------
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

            # ---- geoip gate (engine.c:1031-1126) ---------------------
            if rule.geoip_track:
                ip = src_ip if rule.geoip_track == "by_src" else dst_ip
                if not ip:
                    continue  # invalid IP ⇒ GEOIP_SKIP ⇒ fail
                cc = self.lookups.geo.lookup(ip) if self.lookups.geo else None
                if cc is None:
                    continue  # country not found ⇒ GEOIP_SKIP ⇒ fail
                              # (geoip.c:195-209 NOT_FOUND → SKIP)
                in_list = cc in rule.geoip_codes
                if rule.geoip_isnot == in_list:
                    continue

            # ---- blacklist gate (engine.c:1147-1174) -----------------
            if rule.blacklist:
                bl = self.lookups.blacklist
                if bl is None:
                    continue
                if ips is None:
                    ips = extract_ips(text)
                mode = rule.blacklist
                if mode == "by_src":
                    hit = bool(src_ip) and src_ip in bl
                elif mode == "by_dst":
                    hit = bool(dst_ip) and dst_ip in bl
                elif mode == "both":
                    hit = bool(src_ip) and bool(dst_ip) and src_ip in bl and dst_ip in bl
                else:  # all — any of the parsed IPs (engine.c:1160-1170)
                    hit = any(ip in bl for ip, _ in ips)
                if not hit:
                    continue

            # ---- zeekintel gate (engine.c:1297-1360) -----------------
            if rule.zeekintel:
                if not self._zeekintel(rule, text, src_ip, dst_ip, ips, hashes, username):
                    continue

            # ---- alert_time (src/aetas.c:48-144; event ts) -----------
            if rule.alert_days is not None or rule.alert_hours is not None:
                ts = row["ts"]
                dow = (ts.weekday() + 1) % 7  # reference: 0=Sunday
                if rule.alert_days is not None and dow not in rule.alert_days:
                    continue
                if rule.alert_hours is not None:
                    hhmm = ts.hour * 100 + ts.minute
                    a, b = rule.alert_hours
                    in_win = (a <= hhmm <= b) if a <= b else (hhmm >= a or hhmm <= b)
                    if not in_win:
                        continue

            # ---- xbit conditions (xbit-mmap.c:181-408) ---------------
            xbit_ok = True
            has_xbit_setunset = any(x.op in ("set", "unset") for x in rule.xbits)
            if rule.xbits and not has_xbit_setunset:
                # routing.c:73-86 — conditions only gate when the rule has
                # no set/unset ops
                xbit_ok = self._xbit_condition(rule, st, src_ip, dst_ip, now)
            if not xbit_ok:
                continue

            # ---- flexbit conditions (routing.c:55-70) ----------------
            if rule.flexbits:
                has_set = any(f.op == "set" for f in rule.flexbits)
                conds = [f for f in rule.flexbits if f.op in ("isset", "isnotset")]
                counts = [f for f in rule.flexbits if f.op == "count"]
                if conds:
                    if not self._flexbit_condition(conds, st, src_ip, dst_ip,
                                                   src_port, dst_port, username, now):
                        continue
                elif has_set:
                    pass  # set-only: routing passes
                if counts and not all(
                        self._flexbit_count(f, st, src_ip, dst_ip, now) for f in counts):
                    continue

            # =========== ROUTED (saganfound, engine.c:1398) ===========
            res.counters["saganfound"] += 1
            res.hits.append((row["conv_id"], row["turn_idx"], rule.sid))

            # ---- after (engine.c:1374-1381) --------------------------
            after_flag = False
            if rule.after is not None:
                after_flag = self._after(rule, st, src_ip, dst_ip,
                                         src_port, dst_port, username, now, res)

            # ---- threshold: only if after didn't suppress
            # (engine.c:1385-1389) -------------------------------------
            thresh_flag = False
            if rule.threshold is not None and not after_flag:
                thresh_flag = self._threshold(rule, st, src_ip, dst_ip,
                                              src_port, dst_port, username, now, res)

            if after_flag or thresh_flag:
                continue

            # ---- xbit/flexbit set (engine.c:1417-1427) ---------------
            if has_xbit_setunset:
                self._xbit_set(rule, st, src_ip, dst_ip, now)
            for f in rule.flexbits:
                if f.op == "set":
                    self._flexbit_set(f, st, src_ip, dst_ip, src_port,
                                      dst_port, username, now)
                elif f.op == "unset":
                    self._flexbit_unset(f, st, src_ip, dst_ip, src_port,
                                        dst_port, username)

            # ---- emit / pass break (engine.c:1436-1453) --------------
            if rule.action == "pass":
                # bypass rule: stop all further rule processing for this
                # record; no alert (etc/sagan.yaml:493-500 semantics — we
                # deviate from engine.c:1442 which also emits)
                break

            noalert = rule.flexbits and rule.flexbit_noalert
            if rule.action == "alert" and not noalert:
                res.counters["alert_total"] += 1
                sinks = list(self.config.sinks)
                if rule.email:
                    sinks.append(SINK_EMAIL)
                if rule.external:
                    sinks.append(SINK_EXTERNAL)
                for sink in sinks:
                    res.routed.append((sink, rule.sid, row["conv_id"], row["turn_idx"]))
            # drop: counted in hits, routed nowhere

    # ------------------------------------------------------------------
    _json_cache_key = None
    _json_cache_val = None

    def _json(self, text: str):
        if self._json_cache_key is text:
            return self._json_cache_val
        self._json_cache_key = text
        self._json_cache_val = try_parse_json_text(text)
        return self._json_cache_val

    def _zeekintel(self, rule: Rule, text: str, src_ip: str, dst_ip: str,
                   ips, hashes, username: str) -> bool:
        """All listed intel lookups must hit (engine.c:1297-1360 requires
        zeekintel_results true). Non-IP kinds are substring scans of the
        message against the loaded tables (zeek-intel.c:507-778)."""
        lk = self.lookups
        if ips is None:
            ips = extract_ips(text)
        if hashes is None:
            hashes = extract_hashes(text)
        ipset = lk.intel_set("ip")
        for kind in rule.zeekintel:
            if kind == "src_ipaddr":
                ok = src_ip in ipset
            elif kind == "dst_ipaddr":
                ok = dst_ip in ipset
            elif kind == "both":
                ok = src_ip in ipset and dst_ip in ipset
            elif kind == "all":
                ok = any(ip in ipset for ip, _ in ips)
            elif kind == "file_hash":
                hs = lk.intel_set("hash")
                ok = any(h and h in hs for h in hashes.values())
            elif kind == "domain":
                ok = any(v in text for v in lk.intel_set("domain"))
            elif kind == "url":
                ok = any(v in text for v in lk.intel_set("url"))
            elif kind == "software":
                ok = any(v in text for v in lk.intel_set("software"))
            elif kind == "user_name":
                ok = username in lk.intel_set("username") if username else False
            elif kind == "file_name":
                ok = any(v in text for v in lk.intel_set("filename"))
            else:
                ok = False
            if not ok:
                return False
        return True

    # ---- xbits -------------------------------------------------------
    @staticmethod
    def _xbit_key(track: str, src_ip: str, dst_ip: str) -> str:
        # Xbit_Return_Tracking_Hash (src/xbit.c): 1=src, 2=dst, 3=pair
        if track == "ip_src":
            return src_ip
        if track == "ip_dst":
            return dst_ip
        return f"{src_ip}:{dst_ip}"

    def _xbit_condition(self, rule: Rule, st: _ConvState,
                        src_ip: str, dst_ip: str, now: int) -> bool:
        """All isset/isnotset atoms must hold (xbit-mmap.c:264-270: counts
        must equal)."""
        for x in rule.xbits:
            key = (x.name, self._xbit_key(x.track, src_ip, dst_ip))
            expire = st.xbits.get(key, 0)
            live = expire != 0 and now < expire
            if x.op == "isset" and not live:
                return False
            if x.op == "isnotset" and live:
                return False
        return True

    def _xbit_set(self, rule: Rule, st: _ConvState,
                  src_ip: str, dst_ip: str, now: int) -> None:
        for x in rule.xbits:
            key = (x.name, self._xbit_key(x.track, src_ip, dst_ip))
            if x.op == "set":
                st.xbits[key] = now + x.expire      # xbit-mmap.c:100-140
            elif x.op == "unset":
                if key in st.xbits:
                    st.xbits[key] = 0               # xbit-mmap.c:168

    # ---- flexbits ----------------------------------------------------
    @staticmethod
    def _flex_match(f, e, src_ip, dst_ip, src_port, dst_port, username) -> bool:
        """Direction comparisons (flexbit-mmap.c:120-320 condition table;
        ``*_p`` variants additionally compare ports, flexbit-mmap.c:240+;
        direction ids per src/flexbit.c:63-140)."""
        d = f.direction
        if d == "none":
            return True
        if d == "by_src":
            return e[1] == src_ip
        if d == "by_dst":
            return e[2] == dst_ip
        if d == "both":
            return e[1] == src_ip and e[2] == dst_ip
        if d == "reverse":
            return e[1] == dst_ip and e[2] == src_ip
        if d == "src_xbitdst":
            return e[2] == src_ip
        if d == "dst_xbitsrc":
            return e[1] == dst_ip
        if d == "username":
            return e[5] == username
        if d == "both_p":
            return (e[1] == src_ip and e[2] == dst_ip
                    and e[3] == src_port and e[4] == dst_port)
        if d == "by_src_p":
            return e[1] == src_ip and e[3] == src_port
        if d == "by_dst_p":
            return e[2] == dst_ip and e[4] == dst_port
        if d == "reverse_p":
            return (e[1] == dst_ip and e[2] == src_ip
                    and e[3] == dst_port and e[4] == src_port)
        return False

    def _flexbit_condition(self, conds, st: _ConvState, src_ip, dst_ip,
                           src_port, dst_port, username, now: int) -> bool:
        for f in conds:
            hit = any(
                e[0] == f.name and e[6] > now
                and self._flex_match(f, e, src_ip, dst_ip, src_port, dst_port, username)
                for e in st.flexbits
            )
            if f.op == "isset" and not hit:
                return False
            if f.op == "isnotset" and hit:
                return False
        return True

    def _flexbit_count(self, f, st: _ConvState, src_ip, dst_ip, now: int) -> bool:
        n = sum(
            1 for e in st.flexbits
            if e[0] == f.name and e[6] > now
            and self._flex_match(f, e, src_ip, dst_ip, 0, 0, "")
        )
        return n > f.count_val if f.count_op == ">" else n < f.count_val

    def _flexbit_set(self, f, st: _ConvState, src_ip, dst_ip,
                     src_port, dst_port, username, now: int) -> None:
        # update an existing same-endpoints entry, else append
        # (flexbit-mmap.c:925-1639)
        for e in st.flexbits:
            if (e[0] == f.name and e[1] == src_ip and e[2] == dst_ip
                    and e[3] == src_port and e[4] == dst_port and e[5] == username):
                e[6] = now + f.expire
                return
        st.flexbits.append([f.name, src_ip, dst_ip, src_port, dst_port,
                            username, now + f.expire])

    def _flexbit_unset(self, f, st: _ConvState, src_ip, dst_ip,
                       src_port, dst_port, username) -> None:
        for e in st.flexbits:
            if e[0] == f.name and self._flex_match(f, e, src_ip, dst_ip,
                                                   src_port, dst_port, username):
                e[6] = 0

    # ---- after / threshold ------------------------------------------
    @staticmethod
    def _track_key(spec, src_ip, dst_ip, src_port, dst_port, username) -> str:
        # after.c:108-110 / threshold.c:111-113 hash "src|sport|dst|dport|user"
        s = src_ip if spec.by_src else ""
        d = dst_ip if spec.by_dst else ""
        u = username if spec.by_username else ""
        sp = src_port if spec.by_srcport else 0
        dp = dst_port if spec.by_dstport else 0
        return f"{s}|{sp}|{d}|{dp}|{u}"

    def _after(self, rule: Rule, st: _ConvState, src_ip, dst_ip,
               src_port, dst_port, username, now: int, res: EvalResult) -> bool:
        """True ⇒ suppress. Transcription of After2 (src/after.c:51-229):
        a new key returns True unconditionally (after.c:193-229); an
        existing key increments, resets when the anchored window expired
        (strictly >, after.c:132-137), and only alerts once count exceeds
        the target (after.c:140-179, which also slides utime)."""
        spec = rule.after
        key = (rule.sid, self._track_key(spec, src_ip, dst_ip, src_port, dst_port, username))
        ent = st.after.get(key)
        if ent is None:
            st.after[key] = [1, now]
            return True
        ent[0] += 1
        flag = True
        if now - ent[1] > spec.seconds:
            ent[0] = 1
            ent[1] = now
            flag = True
        if spec.count < ent[0]:
            ent[1] = now
            flag = False
            res.counters["after_total"] += 1
        return flag

    def _threshold(self, rule: Rule, st: _ConvState, src_ip, dst_ip,
                   src_port, dst_port, username, now: int, res: EvalResult) -> bool:
        """True ⇒ suppress. Transcription of Threshold2
        (src/threshold.c:54-234): 'suppress' slides utime on every event
        (threshold.c:126-131), 'limit' keeps the window anchored
        (threshold.c:133-137); new keys alert (return False)."""
        spec = rule.threshold
        key = (rule.sid, self._track_key(spec, src_ip, dst_ip, src_port, dst_port, username))
        ent = st.threshold.get(key)
        if ent is None:
            st.threshold[key] = [1, now]
            return False
        ent[0] += 1
        if spec.ttype == "suppress":
            old = now - ent[1]
            ent[1] = now
        else:  # limit
            old = now - ent[1]
        flag = False
        if old > spec.seconds:
            ent[0] = 1
            ent[1] = now
            flag = False
        if spec.count < ent[0]:
            flag = True
            res.counters["threshold_total"] += 1
        return flag
