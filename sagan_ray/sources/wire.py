"""Wire-format line parsers: the SyslogInput_Pipe / SyslogInput_JSON
analogs (reference src/input-pipe.c:41-339, src/input-json.c:47-547).

These turn a Dataset of raw text lines (``ray.data.read_text`` — the
File_Input/FIFO analog) into the canonical transcript record:

- pipe format: ``conv_id|turn_idx|role|tool|ts|text`` (the reference's
  ``host|facility|priority|level|tag|date|time|program|message``
  re-shaped to the transcript schema). Malformed fields get sentinel
  values and are counted, per input-pipe.c:164-338.
- JSON lines: one JSON object per line, with a field-alias map applied
  (the json-input.map analog, input-json.c:103-244): map keys are
  transcript columns, values are dotted JSON paths; ``%JSON%`` as the
  text alias keeps the whole raw line as the message.
"""

from __future__ import annotations

import json
from datetime import datetime

import numpy as np
import pyarrow as pa

from ..synth import SCHEMA

PIPE_FIELDS = 6
_SENTINEL_TS = datetime(1970, 1, 1)

DEFAULT_JSON_MAP = {
    "conv_id": ".conv_id",
    "turn_idx": ".turn_idx",
    "role": ".role",
    "tool": ".tool",
    "ts": ".ts",
    "text": ".text",
}

PARSED_SCHEMA = pa.schema(list(SCHEMA) + [pa.field("malformed", pa.bool_())])


def _parse_ts(s: str) -> datetime | None:
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
                "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    try:
        return datetime.utcfromtimestamp(float(s))
    except (ValueError, OSError, OverflowError):
        return None


def parse_pipe_batch(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized-split pipe-format parse with per-field sentinels +
    a ``malformed`` flag column (the malformed_* counter analog)."""
    lines = tbl.column(text_col).to_pylist()
    n = len(lines)
    conv = [""] * n
    turn = np.zeros(n, dtype=np.int32)
    role = [""] * n
    tool = [""] * n
    ts = [_SENTINEL_TS] * n
    text = [""] * n
    bad = np.zeros(n, dtype=bool)
    for i, line in enumerate(lines):
        parts = (line or "").split("|", PIPE_FIELDS - 1)
        if len(parts) != PIPE_FIELDS:
            bad[i] = True
            text[i] = line or ""
            continue
        conv[i] = parts[0]
        try:
            turn[i] = int(parts[1])
        except ValueError:
            bad[i] = True
        role[i] = parts[2]
        tool[i] = parts[3]
        t = _parse_ts(parts[4])
        if t is None:
            bad[i] = True
        else:
            ts[i] = t
        text[i] = parts[5]
    return pa.Table.from_arrays([
        pa.array(conv, pa.string()),
        pa.array(turn, pa.int32()),
        pa.array(role, pa.string()),
        pa.array(text, pa.large_string()),
        pa.array(tool, pa.string()),
        pa.array(ts, pa.timestamp("us")),
        pa.array(bad, pa.bool_()),
    ], schema=PARSED_SCHEMA)


def _dig(obj, dotted: str):
    cur = obj
    for part in dotted.lstrip(".").split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def parse_json_batch(tbl: pa.Table, text_col: str = "text",
                     field_map: dict[str, str] | None = None) -> pa.Table:
    """JSON-lines parse with alias map (json-input.map analog). A map
    value of ``%JSON%`` keeps the whole raw line (input-json.c '%JSON%'
    handling)."""
    fmap = field_map or DEFAULT_JSON_MAP
    lines = tbl.column(text_col).to_pylist()
    n = len(lines)
    cols = {"conv_id": [""] * n, "role": [""] * n, "tool": [""] * n,
            "text": [""] * n}
    turn = np.zeros(n, dtype=np.int32)
    ts = [_SENTINEL_TS] * n
    bad = np.zeros(n, dtype=bool)
    for i, line in enumerate(lines):
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError
        except (ValueError, RecursionError):
            bad[i] = True
            cols["text"][i] = line or ""
            continue
        for field, path in fmap.items():
            v = line if path == "%JSON%" else _dig(obj, path)
            if v is None:
                if field in ("conv_id", "text"):
                    bad[i] = True
                continue
            if field == "turn_idx":
                try:
                    turn[i] = int(v)
                except (TypeError, ValueError):
                    bad[i] = True
            elif field == "ts":
                t = _parse_ts(str(v))
                if t is None:
                    bad[i] = True
                else:
                    ts[i] = t
            else:
                cols[field][i] = str(v)
    return pa.Table.from_arrays([
        pa.array(cols["conv_id"], pa.string()),
        pa.array(turn, pa.int32()),
        pa.array(cols["role"], pa.string()),
        pa.array(cols["text"], pa.large_string()),
        pa.array(cols["tool"], pa.string()),
        pa.array(ts, pa.timestamp("us")),
        pa.array(bad, pa.bool_()),
    ], schema=PARSED_SCHEMA)


def read_pipe_lines(path: str):
    """File_Input analog over raw lines → parsed transcript records.
    Returns (records_ds); filter ``malformed`` downstream or count it."""
    import ray.data as rd

    ds = rd.read_text(path)
    return ds.map_batches(lambda t: parse_pipe_batch(t, "text"),
                          batch_format="pyarrow")


def read_json_lines(path: str, field_map: dict[str, str] | None = None):
    import ray.data as rd

    ds = rd.read_text(path)
    return ds.map_batches(lambda t: parse_json_batch(t, "text", field_map),
                          batch_format="pyarrow")
