"""Rule model: dataclasses describing one compiled rule.

The rule language mirrors the reference engine's Snort-style syntax
(reference: /root/reference/src/rules.c — parsing; option semantics cited
per-field below). A rule is an ordered short-circuit conjunction of
predicates evaluated in cheapness order (reference
doc/source/high-performance.rst:78-93):

    program/facility/tag pre-match → content chain → meta_content →
    pcre → event_id → json_* → extraction → flow/geoip/blacklist/intel
    gates → xbit/flexbit conditions → alert_time → routing →
    after → threshold → xbit/flexbit set → emit.

Transcript mapping (SURVEY.md §1.3): ``program`` matches the ``role``
column, ``facility``/``tag`` match the ``tool`` column, the message is the
``text`` column, and correlation state is scoped per ``conv_id`` (the
reference's per-IP mmap state becomes per-conversation actor state; see
SURVEY.md §4.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

ACTION_ALERT = "alert"
ACTION_DROP = "drop"
ACTION_PASS = "pass"

# xbit track directions (reference src/xbit.c Xbit_Return_Tracking_Hash:
# 1=ip_src, 2=ip_dst, 3=ip_pair)
TRACK_IP_SRC = "ip_src"
TRACK_IP_DST = "ip_dst"
TRACK_IP_PAIR = "ip_pair"

# flexbit directions (reference src/flexbit.c:63-140 type table)
FLEX_NONE = "none"
FLEX_BOTH = "both"
FLEX_BY_SRC = "by_src"
FLEX_BY_DST = "by_dst"
FLEX_REVERSE = "reverse"
FLEX_USERNAME = "username"


@dataclass
class ContentAtom:
    """One ``content:`` option (reference src/content.c:42-179).

    The reference's windows are *static slices* of the message, not
    match-position-relative (content.c:65-117): ``offset`` O≠0 searches
    ``msg[O:]``; ``depth`` D≠0 then keeps the first D+1 chars (the quirky
    ``strlcpy(..., depth+2)`` at content.c:97); ``distance`` X≠0 overrides
    both with ``msg[prev_depth + X + 1:]`` where ``prev_depth`` is the
    *previous* atom's depth (content.c:105-107), and ``within`` W≠0 keeps
    the first W chars of that (``strlcpy(..., within+1)``, content.c:112).
    0 means "modifier absent" throughout, as in the C struct. ``nocase``
    lowercases both sides; ``negated`` inverts; atoms are ANDed with
    short-circuit. ``|3a|`` hex escapes are decoded at parse time
    (src/rules.c:2798-3006). We slice on codepoints where the byte-oriented
    C slices on bytes — identical for ASCII payloads, internally consistent
    otherwise.
    """

    pattern: str
    nocase: bool = False
    negated: bool = False
    offset: int = 0
    depth: int = 0
    distance: int = 0
    within: int = 0

    def window(self, prev_depth: int) -> tuple[int, Optional[int]]:
        """(start, stop) slice bounds of the search window."""
        if self.distance != 0:
            start = prev_depth + self.distance + 1
            return start, (start + self.within) if self.within else None
        start = self.offset
        stop = (start + self.depth + 1) if self.depth else None
        return start, stop


@dataclass
class MetaContent:
    """One ``meta_content:"tmpl %sagan%", v1, v2`` option — an OR-list of
    substrings substituted into the template (reference
    src/meta-content.c:51-224, parse src/rules.c:1913-2012).

    meta_offset/meta_depth/meta_distance/meta_within carry the SAME
    static-slice window semantics as content (meta-content.c:74-130
    mirrors content.c:65-117 including the depth+2/within+1 strlcpy
    quirks and distance chaining off the PREVIOUS meta atom's depth)."""

    patterns: list[str]
    nocase: bool = False
    negated: bool = False
    offset: int = 0
    depth: int = 0
    distance: int = 0
    within: int = 0

    # identical slice arithmetic to ContentAtom.window
    window = ContentAtom.window


@dataclass
class PcreAtom:
    """One ``pcre:"/re/flags"`` option (reference src/pcre-s.c:39-68).
    All pcre atoms of a rule must match (AND)."""

    pattern: str
    flags: int = 0          # python re flags
    negated: bool = False
    _compiled: Optional[re.Pattern] = field(default=None, repr=False, compare=False)

    def compiled(self) -> re.Pattern:
        if self._compiled is None:
            object.__setattr__(self, "_compiled", re.compile(self.pattern, self.flags))
        return self._compiled


@dataclass
class JsonAtom:
    """``json_content`` / ``json_pcre`` / ``json_meta_content`` over a
    dotted key of the flattened message JSON (reference
    src/json-content.c:47-176, src/json-pcre.c:46, src/json-meta-content.c).

    kind: 'content' (exact match unless ``contains``), 'pcre', 'meta'.
    Missing key ⇒ no match (json-content.c:80-90).
    """

    kind: str
    key: str
    values: list[str] = field(default_factory=list)
    nocase: bool = False
    negated: bool = False
    contains: bool = False      # json_contains modifier → substring match
    decode_base64: bool = False  # json_decode_base64: decode value first
    flags: int = 0              # for pcre kind
    _compiled: Optional[re.Pattern] = field(default=None, repr=False, compare=False)

    def compiled(self) -> re.Pattern:
        if self._compiled is None:
            object.__setattr__(self, "_compiled", re.compile(self.values[0], self.flags))
        return self._compiled


@dataclass
class XbitSpec:
    """One xbit action/condition (reference src/xbit-mmap.c:60-408, parse
    src/rules.c:1173-1381). op: set|unset|isset|isnotset."""

    op: str
    name: str
    track: str = TRACK_IP_PAIR
    expire: int = 300


@dataclass
class FlexbitSpec:
    """One flexbit (reference src/flexbit-mmap.c, src/flexbit.c:63-140).
    op: set|unset|isset|isnotset|count. ``direction`` chooses the state-key
    fields; ``count_op``/``count_val`` for op=='count' (>/< compare,
    src/flexbit-mmap.c:851-918)."""

    op: str
    name: str
    direction: str = FLEX_NONE
    expire: int = 300
    count_op: str = ">"
    count_val: int = 0


@dataclass
class AfterSpec:
    """``after: track ..., count C, seconds S`` (reference src/after.c:51-229,
    parse src/rules.c:3382-3514). Suppress until more than C matches have
    been seen inside an anchored S-second window; the window anchor resets
    when the gap since the anchor exceeds S. Track fields are ANDed into the
    state key (after.c:108-110 hash of "src|sport|dst|dport|user")."""

    count: int
    seconds: int
    by_src: bool = False
    by_dst: bool = False
    by_username: bool = False
    by_srcport: bool = False
    by_dstport: bool = False


@dataclass
class ThresholdSpec:
    """``threshold: type limit|suppress, track ..., count C, seconds S``
    (reference src/threshold.c:54-234, parse src/rules.c:3255-3381).

    limit: the window is anchored at the first event (utime not slid,
    threshold.c:133-137); the first C events per window alert, the rest are
    suppressed until the anchor expires.
    suppress: utime slides on every event (threshold.c:126-131), so the
    count only resets after a quiet gap > S; alerts until count exceeds C,
    then suppresses.
    """

    ttype: str              # 'limit' | 'suppress'
    count: int
    seconds: int
    by_src: bool = False
    by_dst: bool = False
    by_username: bool = False
    by_srcport: bool = False
    by_dstport: bool = False


@dataclass
class Rule:
    """One compiled rule. Field-by-field reference citations in class docs
    above; header fields per src/rules.c:390-466."""

    action: str = ACTION_ALERT
    proto: str = "any"

    sid: int = 0
    rev: int = 1
    msg: str = ""
    classtype: str = ""
    priority: int = 0
    reference: list[str] = field(default_factory=list)
    metadata: str = ""

    # --- pre-match (reference engine.c:492-581; '|' alternation, '*'/'?'
    # wildcards via src/util.c:970-990 Wildcard). program→role,
    # facility/tag→tool in the transcript mapping.
    program: Optional[str] = None
    facility: Optional[str] = None
    tag: Optional[str] = None
    # additional tool-column prematch constraints (syslog_level /
    # syslog_priority / repeated facility) — ANDed like the reference's
    # independent facility/level/priority checks (engine.c:492-581)
    levels: list[str] = field(default_factory=list)
    # append_program: match text + " | " + role (engine.c:595-627)
    append_program: bool = False

    # json_map: per-rule remapping of flattened JSON keys onto internal
    # fields BEFORE matching (reference engine.c:321-488; original
    # message/program restored after each rule, engine.c:1514-1529).
    # Entries are (field, dotted_key); mappable fields: message, program,
    # event_id, src_ip, dst_ip, src_port, dst_port, proto, username,
    # md5, sha1, sha256.
    json_maps: list[tuple[str, str]] = field(default_factory=list)

    # --- stateless predicates
    contents: list[ContentAtom] = field(default_factory=list)
    meta_contents: list[MetaContent] = field(default_factory=list)
    pcres: list[PcreAtom] = field(default_factory=list)
    event_ids: list[str] = field(default_factory=list)
    json_atoms: list[JsonAtom] = field(default_factory=list)

    # normalize: run the message through the loaded normalization
    # rulebase (the liblognorm analog, functions.normalize) and use the
    # extracted src/dst/port/username/proto fields as base values
    # (reference src/rules.c:2764-2766, src/liblognormalize.c:105-264)
    normalize: bool = False

    # --- extraction (reference engine.c:791-921, parse rules.c:960-1172)
    parse_src_ip: int = 0       # 1-based position into the Parse_IP cache
    parse_dst_ip: int = 0
    parse_port: bool = False
    parse_proto: bool = False
    # infer proto from the program/role value instead of the message
    # (src/parsers/proto.c Parse_Proto_Program)
    parse_proto_program: bool = False
    parse_hash: Optional[str] = None    # 'md5'|'sha1'|'sha256'
    default_proto: str = ""
    default_src_port: int = 0
    default_dst_port: int = 0

    # --- enrichment gates
    # country_code: track by_src|by_dst, is|isnot CC,CC (engine.c:1031-1126)
    geoip_track: Optional[str] = None   # 'by_src'|'by_dst'
    geoip_isnot: bool = False
    geoip_codes: list[str] = field(default_factory=list)
    # blacklist: by_src|by_dst|both|all (engine.c:1147-1174)
    blacklist: Optional[str] = None
    # zeekintel: comma list of intel lookups (engine.c:1297-1360)
    zeekintel: list[str] = field(default_factory=list)
    # bluedot reputation gate — offline category-snapshot analog of the
    # reference's Bluedot API lookups (processors/bluedot.c:736-1648,
    # parse rules.c:3742-3993). kind: ip_reputation|file_hash|url|
    # filename|ja3; track applies to ip_reputation (1=src 2=dst 3=both
    # 4=all per bluedot_ipaddr_type); cats must intersect the snapshot's
    # category for the looked-up value. mdate/cdate effective periods are
    # accepted-and-ignored (the snapshot carries no timestamps).
    bluedot_kind: Optional[str] = None
    bluedot_track: Optional[str] = None
    bluedot_cats: list[str] = field(default_factory=list)

    # --- time gate: alert_time days/hours (src/aetas.c:48-144). Uses event
    # ts, not wall clock (deterministic batch semantics).
    alert_days: Optional[set[int]] = None   # 0=Sunday … 6=Saturday
    alert_hours: Optional[tuple[int, int]] = None   # (hhmm_start, hhmm_end)

    # --- stateful correlation
    xbits: list[XbitSpec] = field(default_factory=list)
    flexbits: list[FlexbitSpec] = field(default_factory=list)
    flexbit_noalert: bool = False
    after: Optional[AfterSpec] = None
    threshold: Optional[ThresholdSpec] = None

    # --- header flow gate (reference src/flow.c:48-504, checked
    # engine.c:926-940): src/dst CIDR-group membership + port equality over
    # the *extracted* src_ip/dst_ip/ports. None = 'any'. Each net is
    # (lo_int, hi_int, negated) over the IPv6-width integer form.
    src_nets: Optional[list[tuple[int, int, bool]]] = None
    dst_nets: Optional[list[tuple[int, int, bool]]] = None
    src_port_eq: Optional[int] = None
    dst_port_eq: Optional[int] = None

    # --- routing / sinks
    email: Optional[str] = None
    external: Optional[str] = None

    # offload: name of a registered local UDF predicate (Lookups.offload)
    # — the no-network analog of POSTing the record to an HTTP endpoint
    # and continuing only on a "true" response (src/offload.c:47-167,
    # parse rules.c:3709-3725). Unknown name / raising predicate ⇒ no
    # match (the curl-failure → false path).
    offload: Optional[str] = None

    # dynamic_load: path of a ruleset to load when this rule fires
    # (reference src/processors/dynamic-rules.c:61-185, parse
    # rules.c:1755-1778); consumed by pipelines.engine.run_engine_dynamic
    dynamic_ruleset: Optional[str] = None

    # position in the ruleset (evaluation order)
    idx: int = -1

    # ------------------------------------------------------------------
    @property
    def is_stateful(self) -> bool:
        """True if this rule reads or writes correlation state — such rules
        (and the rows that stateless-match them) must flow through the
        per-conv ordered correlation stage."""
        return bool(self.xbits or self.flexbits or self.after or self.threshold)

    @property
    def has_state_condition(self) -> bool:
        return any(x.op in ("isset", "isnotset") for x in self.xbits) or any(
            f.op in ("isset", "isnotset", "count") for f in self.flexbits
        )

    def needs_ips(self) -> bool:
        return bool(
            self.parse_src_ip or self.parse_dst_ip or self.blacklist
            or self.geoip_track or self.zeekintel
            or self.src_nets or self.dst_nets
            or self.bluedot_kind == "ip_reputation"
        )


@dataclass
class RuleSet:
    rules: list[Rule] = field(default_factory=list)
    variables: dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        for i, r in enumerate(self.rules):
            r.idx = i

    def __len__(self) -> int:
        return len(self.rules)

    def __iter__(self):
        return iter(self.rules)

    @property
    def has_stateful(self) -> bool:
        return any(r.is_stateful for r in self.rules)

    def by_sid(self, sid: int) -> Rule:
        for r in self.rules:
            if r.sid == sid:
                return r
        raise KeyError(sid)
