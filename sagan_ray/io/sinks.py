"""Output sinks: per-sink Parquet directories + EVE-JSON shaping.

Sink analogs (SURVEY.md §2.1): alert (src/output-plugins/alert.c), fast
(fast.c), eve (eve.c + src/json-handler.c:54-232 Format_JSON_Alert_EVE),
syslog (syslog-handler.c), email (esmtp.c), external (external.c).

Resumable layout: each sink writes into ``out_dir/sink=<name>/`` via
Ray's parquet writer (a directory of part files), and a ``_SUCCESS.json``
manifest records the finished sinks + row counts — a rerun can skip sinks
whose manifest entry exists (the batch analog of the reference's
mmap-persisted restart state, src/ipc.c:458-733; input position is *not*
checkpointed there either).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa


def eve_format_batch(tbl: pa.Table) -> pa.Table:
    """Shape routed rows as Suricata-EVE-style JSON strings (the
    Format_JSON_Alert_EVE analog, src/json-handler.c:54-232: timestamp,
    flow/correlation id, signature block, payload). Assembled with one
    Arrow ``binary_join_element_wise`` pass over escaped columns — this
    formats EVERY routed alert, so no per-row json.dumps."""
    import pyarrow.compute as pc

    big = pa.large_string()

    def s(name):
        # fill numeric nulls with 0 — one null operand would otherwise
        # null out the ENTIRE joined JSON line (binary_join_element_wise
        # default null handling)
        return pc.cast(pc.fill_null(pc.cast(tbl.column(name), pa.string()),
                                    "0"), big)

    def esc(name):
        return _json_escape(pc.cast(pc.fill_null(tbl.column(name), ""), big))

    out = pc.binary_join_element_wise(
        pa.scalar('{"timestamp":', big), s("ts_epoch"),
        pa.scalar(',"event_type":"alert","conv_id":"', big), esc("conv_id"),
        pa.scalar('","turn_idx":', big), s("turn_idx"),
        pa.scalar(',"src_ip":"', big), esc("src_ip"),
        pa.scalar('","src_port":', big), s("src_port"),
        pa.scalar(',"dest_ip":"', big), esc("dst_ip"),
        pa.scalar('","dest_port":', big), s("dst_port"),
        pa.scalar(',"alert":{"signature_id":', big), s("sid"),
        pa.scalar(',"rev":1},"role":"', big), esc("role"),
        pa.scalar('","tool":"', big), esc("tool"),
        pa.scalar('","payload":"', big), esc("text"),
        pa.scalar('"}', big),
        pa.scalar("", big))
    return tbl.append_column("eve", out)


def _json_escape(col, out_type=None) -> "pa.Array":
    """Vectorized JSON string-escape of an Arrow string column: the
    common escapes run as Arrow kernels; rows still containing other C0
    control characters (rare — wire-ingested payloads can carry them)
    get a python \\u00XX fallback so the output is always valid RFC 8259."""
    import re as _re

    import pyarrow.compute as pc

    col = pc.replace_substring(col, "\\", "\\\\")
    col = pc.replace_substring(col, '"', '\\"')
    col = pc.replace_substring(col, "\n", "\\n")
    col = pc.replace_substring(col, "\r", "\\r")
    col = pc.replace_substring(col, "\t", "\\t")
    dirty = pc.match_substring_regex(col, r"[\x00-\x1f]")
    if pc.any(pc.fill_null(dirty, False)).as_py():
        vals = col.to_numpy(zero_copy_only=False)
        mask = pc.fill_null(dirty, False).to_numpy(zero_copy_only=False)
        ctrl = _re.compile(r"[\x00-\x1f]")

        def fix(s):
            return ctrl.sub(lambda m: f"\\u{ord(m.group(0)):04x}", s)

        col = pa.array([fix(v) if m else v for v, m in zip(vals, mask)],
                       pa.large_string())
    return col


def eve_log_all(ds):
    """Log_JSON analog (reference src/output-plugins/eve.c:69-93 +
    json-handler.c:292): EVE-shape EVERY record, not just alerts — an
    all-rows stage, so the JSON lines are assembled with one Arrow
    ``binary_join_element_wise`` pass over escaped columns, never a
    per-row ``json.dumps`` loop."""
    import pyarrow.compute as pc

    def f(tbl: pa.Table) -> pa.Table:
        big = pa.large_string()
        ts = pc.cast(pc.cast(tbl.column("ts"), pa.string()), big)
        conv = _json_escape(pc.cast(pc.fill_null(tbl.column("conv_id"), ""), big))
        turn = pc.cast(pc.cast(tbl.column("turn_idx"), pa.string()), big)
        role = _json_escape(pc.cast(pc.fill_null(tbl.column("role"), ""), big))
        tool = _json_escape(pc.cast(pc.fill_null(tbl.column("tool"), ""), big))
        text = _json_escape(pc.cast(pc.fill_null(tbl.column("text"), ""), big))
        out = pc.binary_join_element_wise(
            pa.scalar('{"timestamp":"', big), ts,
            pa.scalar('","event_type":"log","conv_id":"', big), conv,
            pa.scalar('","turn_idx":', big), turn,
            pa.scalar(',"role":"', big), role,
            pa.scalar('","tool":"', big), tool,
            pa.scalar('","payload":"', big), text,
            pa.scalar('"}', big),
            pa.scalar("", big))
        return pa.table({"eve": out})

    return ds.map_batches(f, batch_format="pyarrow")


def write_sinks(engine_result, out_dir: str, *, overwrite: bool = False) -> dict:
    """Fan routed alerts out to one Parquet directory per sink and return
    {sink: rows}. Executes the match pipeline once (single explode pass,
    partitioned write)."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_SUCCESS.json")
    if not overwrite and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    # a crashed prior run (no manifest) or an overwrite rerun may have
    # left part files behind; counting from the directory would then
    # inflate the manifest — clear the sink dirs first
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    for entry in os.listdir(out_dir):
        if entry.startswith("sink="):
            shutil.rmtree(os.path.join(out_dir, entry))

    exploded = engine_result.routed_exploded()
    # hive partitioning by sink → out_dir/sink=alert/... (resumable per sink)
    exploded.write_parquet(out_dir, partition_cols=["sink"])

    # count from the written files (no pipeline re-execution)
    import pyarrow.parquet as pq

    per_sink: dict[str, int] = {}
    for entry in os.listdir(out_dir):
        if entry.startswith("sink="):
            sink = entry.split("=", 1)[1]
            d = os.path.join(out_dir, entry)
            per_sink[sink] = sum(
                pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                for f in os.listdir(d) if f.endswith(".parquet"))
    with open(manifest_path, "w") as f:
        json.dump(per_sink, f)
    return per_sink
