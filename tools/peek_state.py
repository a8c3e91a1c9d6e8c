#!/usr/bin/env python
"""peek_state — the ``saganpeek`` analog over correlation-state snapshots.

The reference ships ``tools/saganpeek.c`` (reference tools/saganpeek.c:76-80
flags; doc/source/saganpeek.rst): a CLI that opens the engine's mmap IPC
files and prints the live ``after`` / ``threshold`` / ``xbit`` / ``flexbit``
entries, showing only ACTIVE data unless ``-a`` is given. Our durable state
store is the per-bucket parquet snapshot dir written by
``run_engine(state_dir=...)`` (sagan_ray/state/snapshot.py), so this tool
reads that layout instead of mmap files:

    python tools/peek_state.py STATE_DIR [-t TYPE] [-a] [--at EPOCH]

- ``-t/--type``: ``after``, ``threshold``, ``xbit``, ``flexbit`` or ``all``
  (default all). The reference's ``track`` type (tracking-client IPC) has
  no snapshot analog here — track-clients is a stateless aggregate query
  (pipelines/aggregates.py::track_clients) — so it is not a valid type.
- Active vs inactive: the reference compares expire fields against wall
  clock (saganpeek.c:411). This engine is event-time based, so the default
  reference instant is the snapshot's own watermark (max utime/expire seen
  in the store); override with ``--at EPOCH``. xbits/flexbits are active
  while ``expire > at`` (an xbit with expire 0 is the unset sentinel,
  reference xbit-mmap.c:168); after/threshold counters are always shown —
  snapshots only retain entries the pruner proved still influential.
- ``-a/--all`` includes expired / unset entries, like the reference flag.

No Ray session is needed: the snapshot dir is plain parquet.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sagan_ray.state.snapshot import STATE_SCHEMA  # noqa: E402

KINDS = ("after", "threshold", "xbit", "flexbit")


def load_state_table(state_dir: str) -> pa.Table:
    """Concatenate every bucket's snapshot into one table (adds a
    ``bucket`` column). Raises FileNotFoundError on a non-state dir,
    mirroring saganpeek's hard abort on a missing IPC file."""
    files = sorted(glob.glob(os.path.join(state_dir, "bucket=*",
                                          "state.parquet")))
    if not files:
        raise FileNotFoundError(
            f"no bucket=*/state.parquet under {state_dir!r} — not a "
            "state_dir written by run_engine(state_dir=...)")
    parts = []
    for f in files:
        b = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        t = pq.read_table(f)
        parts.append(t.append_column(
            "bucket", pa.array([b] * len(t), pa.int32())))
    return pa.concat_tables(parts) if parts else STATE_SCHEMA.empty_table()


def watermark(tbl: pa.Table) -> int:
    """Default reference instant: the max event-time the store has seen."""
    import pyarrow.compute as pc
    hi = 0
    for col in ("utime", "expire"):
        m = pc.max(tbl.column(col)).as_py()
        if m is not None:
            hi = max(hi, int(m))
    return hi


def select_entries(tbl: pa.Table, kinds=KINDS, at: int | None = None,
                   show_all: bool = False) -> dict[str, list[dict]]:
    """Rows per kind, sorted deterministically; inactive bit entries
    (expire <= at) filtered out unless show_all."""
    if at is None:
        at = watermark(tbl)
    out: dict[str, list[dict]] = {}
    rows = tbl.to_pylist()
    for kind in kinds:
        ent = [r for r in rows if r["kind"] == kind]
        if not show_all and kind in ("xbit", "flexbit"):
            ent = [r for r in ent if r["expire"] > at]
        ent.sort(key=lambda r: (r["conv_id"], r["name"], r["sid"],
                                r["track_key"]))
        out[kind] = ent
    return out


def format_report(by_kind: dict[str, list[dict]], at: int) -> str:
    lines = [f"[reference instant: {at} (event-time epoch)]", ""]
    for kind, ent in by_kind.items():
        lines.append(f"*** {kind} ({len(ent)} entr"
                     f"{'y' if len(ent) == 1 else 'ies'}) ***")
        for r in ent:
            if kind == "xbit":
                state = "active" if r["expire"] > at else (
                    "unset" if r["expire"] == 0 else "expired")
                lines.append(
                    f"Conversation: {r['conv_id']} [bucket {r['bucket']}]\n"
                    f"Name: \"{r['name']}\"  Tracking: {r['track_key']}\n"
                    f"Expire Time: {r['expire']} ({state})")
            elif kind == "flexbit":
                state = "active" if r["expire"] > at else "expired"
                lines.append(
                    f"Conversation: {r['conv_id']} [bucket {r['bucket']}]\n"
                    f"Name: \"{r['name']}\"\n"
                    f"IP SRC: {r['src_ip']}  SRC Port: {r['src_port']}\n"
                    f"IP DST: {r['dst_ip']}  DST Port: {r['dst_port']}\n"
                    f"Username: {r['username']}\n"
                    f"Expire Time: {r['expire']} ({state})")
            else:  # after / threshold — counter entries
                lines.append(
                    f"Conversation: {r['conv_id']} [bucket {r['bucket']}]\n"
                    f"Signature sid: {r['sid']}  Tracking: {r['track_key']}\n"
                    f"Counter: {r['count']}\n"
                    f"Date added/modified: {r['utime']}")
            lines.append("")
        if not ent:
            lines.append("")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="peek into engine correlation-state snapshots "
                    "(the saganpeek analog)")
    ap.add_argument("state_dir", help="state_dir written by "
                                      "run_engine(state_dir=...)")
    ap.add_argument("-t", "--type", default="all",
                    choices=("all",) + KINDS,
                    help="entry kind to show (default: all)")
    ap.add_argument("-a", "--all", action="store_true", dest="show_all",
                    help="show expired/unset entries too "
                         "(default: active only)")
    ap.add_argument("--at", type=int, default=None,
                    help="event-time epoch for the active check "
                         "(default: the snapshot's watermark)")
    args = ap.parse_args(argv)

    try:
        tbl = load_state_table(args.state_dir)
    except FileNotFoundError as e:
        print(f"Error.  {e}. Abort!", file=sys.stderr)
        return 2

    meta = os.path.join(args.state_dir, "_STATE.json")
    if os.path.exists(meta):
        with open(meta) as f:
            n = json.load(f).get("n_buckets")
        print(f"[{args.state_dir}: {n} buckets, {len(tbl)} state rows]")

    kinds = KINDS if args.type == "all" else (args.type,)
    at = args.at if args.at is not None else watermark(tbl)
    print(format_report(select_entries(tbl, kinds, at, args.show_all), at))
    return 0


if __name__ == "__main__":
    sys.exit(main())
