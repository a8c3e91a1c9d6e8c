"""Correlation-state snapshots: per-bucket Parquet serialization of the
xbit/flexbit/after/threshold state so an incremental run continues where
the last one stopped — the analog of the reference's version-checked mmap
state files that survive restarts (/root/reference/src/ipc.c:458-733,
config etc/sagan.yaml:190-212).

Layout: ``state_dir/bucket=K/state.parquet`` — one row per state entry,
tagged by kind, written atomically (tmp + rename). The bucket partitioning
must match the engine's conv-hash buckets, so ``n_buckets`` is recorded in
``state_dir/_STATE.json`` and validated on load.

Cross-instance shared state (the xbit-redis analog,
/root/reference/src/xbit-redis.c + redis.c) — documented stance: the
reference's Redis mode exists so MULTIPLE concurrently-running sagan
processes can observe each other's bits in real time. In this engine the
equivalent sharing is the exchange itself: every conversation's stateful
rows from EVERY input partition meet in exactly one bucket task per run,
so within a run there is nothing to share between workers. ACROSS runs,
these snapshots are the durable shared store (any number of sequential
runs, on any node of the cluster, continue the same state_dir). What is
intentionally NOT supported is two engine runs writing the same state_dir
CONCURRENTLY — the batch model has no analog of interleaved live readers;
partition the input streams into distinct state_dirs instead (one per
follow loop), exactly as the reference requires distinct Redis keyspaces
per logical sensor."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..oracle.evaluator import _ConvState

STATE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("kind", pa.string()),        # xbit | flexbit | after | threshold
    ("name", pa.string()),        # xbit/flexbit name; '' otherwise
    ("sid", pa.int64()),          # after/threshold rule sid; 0 otherwise
    ("track_key", pa.string()),
    ("src_ip", pa.string()),
    ("dst_ip", pa.string()),
    ("src_port", pa.int32()),
    ("dst_port", pa.int32()),
    ("username", pa.string()),
    ("count", pa.int64()),
    ("utime", pa.int64()),
    ("expire", pa.int64()),
])


def states_to_table(states: dict[str, _ConvState]) -> pa.Table:
    rows = []
    for conv, st in states.items():
        for (name, key), expire in st.xbits.items():
            rows.append({"conv_id": conv, "kind": "xbit", "name": name,
                         "track_key": key, "expire": int(expire)})
        for e in st.flexbits:
            rows.append({"conv_id": conv, "kind": "flexbit", "name": e[0],
                         "src_ip": e[1], "dst_ip": e[2],
                         "src_port": int(e[3]), "dst_port": int(e[4]),
                         "username": e[5], "expire": int(e[6])})
        for (sid, key), (count, utime) in st.after.items():
            rows.append({"conv_id": conv, "kind": "after", "sid": int(sid),
                         "track_key": key, "count": int(count),
                         "utime": int(utime)})
        for (sid, key), (count, utime) in st.threshold.items():
            rows.append({"conv_id": conv, "kind": "threshold", "sid": int(sid),
                         "track_key": key, "count": int(count),
                         "utime": int(utime)})
    if not rows:
        return STATE_SCHEMA.empty_table()
    full = [{**{f.name: ("" if pa.types.is_string(f.type) else 0)
                for f in STATE_SCHEMA}, **r} for r in rows]
    return pa.Table.from_pylist(full, schema=STATE_SCHEMA)


def table_to_states(tbl: pa.Table) -> dict[str, _ConvState]:
    states: dict[str, _ConvState] = {}
    for r in tbl.to_pylist():
        st = states.setdefault(r["conv_id"], _ConvState())
        k = r["kind"]
        if k == "xbit":
            st.xbits[(r["name"], r["track_key"])] = r["expire"]
        elif k == "flexbit":
            st.flexbits.append([r["name"], r["src_ip"], r["dst_ip"],
                                r["src_port"], r["dst_port"],
                                r["username"], r["expire"]])
        elif k == "after":
            st.after[(r["sid"], r["track_key"])] = [r["count"], r["utime"]]
        elif k == "threshold":
            st.threshold[(r["sid"], r["track_key"])] = [r["count"], r["utime"]]
    return states


def prune_states(states: dict[str, _ConvState],
                 watermarks: dict[str, int]) -> None:
    """Evict entries that can no longer influence any later event (the
    Clean_IPC_Object analog, reference src/ipc.c:78): xbits/flexbits whose
    expiry is at or before that conversation's OWN event-time watermark
    (max ts seen for the conv in this run). Event times are unrelated
    across conversations, so a bucket-global watermark could prune a
    still-live bit of a lagging conv; convs not seen in this run are left
    untouched. after/threshold entries are kept — they self-reset on
    window expiry and are bounded by (sid × track-key) cardinality."""
    dead = []
    for conv, wm in watermarks.items():
        st = states.get(conv)
        if st is None:
            continue
        st.xbits = {k: v for k, v in st.xbits.items() if v > wm}
        st.flexbits = [e for e in st.flexbits if e[6] > wm]
        if not (st.xbits or st.flexbits or st.after or st.threshold):
            dead.append(conv)
    for conv in dead:
        del states[conv]


def save_bucket_state(state_dir: str, bucket: int,
                      states: dict[str, _ConvState],
                      watermarks: dict[str, int] | None = None) -> None:
    if watermarks is not None:
        prune_states(states, watermarks)
    d = os.path.join(state_dir, f"bucket={bucket}")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, ".state.parquet.tmp")
    pq.write_table(states_to_table(states), tmp)
    os.replace(tmp, os.path.join(d, "state.parquet"))


def load_bucket_state(state_dir: str, bucket: int) -> dict[str, _ConvState]:
    p = os.path.join(state_dir, f"bucket={bucket}", "state.parquet")
    if not os.path.exists(p):
        return {}
    return table_to_states(pq.read_table(p))


class StateDirLockedError(RuntimeError):
    """Another live engine run holds this state_dir (see acquire_state_lock)."""


def acquire_state_lock(state_dir: str):
    """Advisory writer lock for a state_dir — the enforcement half of the
    module docstring's stance: two CONCURRENT engine runs (e.g. two
    ``follow()`` loops) writing one state_dir would interleave per-bucket
    snapshots from different replays and corrupt the carried state (the
    reference serializes concurrent instances through Redis,
    src/xbit-redis.c; sequential runs are the supported batch analog).

    Returns an open file handle holding a non-blocking ``flock`` on
    ``state_dir/_LOCK``; keep it referenced for the writer's lifetime
    (the OS drops the lock when the process exits, so a crashed run
    never wedges the dir). Raises ``StateDirLockedError`` if another
    LIVE process holds it. flock is per-(open file, process) on local
    and NFSv4 filesystems — the cluster deployments this engine targets
    put state_dir on a shared POSIX filesystem where that holds."""
    import fcntl

    os.makedirs(state_dir, exist_ok=True)
    fh = open(os.path.join(state_dir, "_LOCK"), "a+")
    try:
        fcntl.flock(fh.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        fh.close()
        raise StateDirLockedError(
            f"state_dir {state_dir!r} is locked by another live engine "
            f"run; concurrent writers to one state_dir are not supported "
            f"— give each follow loop its own state_dir (see "
            f"state/snapshot.py docstring)") from None
    return fh


def write_state_meta(state_dir: str, n_buckets: int) -> None:
    os.makedirs(state_dir, exist_ok=True)
    with open(os.path.join(state_dir, "_STATE.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "v": 1}, f)


def read_state_meta(state_dir: str) -> int | None:
    """The bucket count this state dir was written with (None if new).
    Raises on an unusable value — the version check the reference applies
    to its mmap files (ipc.c:504-517)."""
    p = os.path.join(state_dir, "_STATE.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        meta = json.load(f)
    n = meta.get("n_buckets")
    if not isinstance(n, int) or not (1 <= n <= 4096):
        raise ValueError(
            f"state_dir metadata is corrupt (n_buckets={n!r}); refusing to "
            "guess a bucket layout — delete the state dir to start fresh")
    return n
