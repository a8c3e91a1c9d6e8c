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
    flow/correlation id, signature block, payload)."""
    n = len(tbl)
    cols = {name: tbl.column(name).to_pylist()
            for name in ("conv_id", "turn_idx", "sid", "ts_epoch", "src_ip",
                         "dst_ip", "src_port", "dst_port", "text", "role", "tool")}
    out = []
    for i in range(n):
        out.append(json.dumps({
            "timestamp": cols["ts_epoch"][i],
            "event_type": "alert",
            "conv_id": cols["conv_id"][i],
            "turn_idx": cols["turn_idx"][i],
            "src_ip": cols["src_ip"][i],
            "src_port": cols["src_port"][i],
            "dest_ip": cols["dst_ip"][i],
            "dest_port": cols["dst_port"][i],
            "alert": {"signature_id": cols["sid"][i], "rev": 1},
            "role": cols["role"][i],
            "tool": cols["tool"][i],
            "payload": cols["text"][i],
        }, separators=(",", ":"), ensure_ascii=False))
    return tbl.append_column("eve", pa.array(out, pa.large_string()))


def eve_log_all(ds):
    """Log_JSON analog (reference src/output-plugins/eve.c:69-93 +
    json-handler.c:292): EVE-shape EVERY record, not just alerts — an
    all-rows map_batches over the raw transcript stream."""
    import json as _json

    def f(tbl: pa.Table) -> pa.Table:
        rows = tbl.to_pylist()
        out = [
            _json.dumps({
                "timestamp": str(r["ts"]),
                "event_type": "log",
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "role": r["role"],
                "tool": r["tool"],
                "payload": r["text"],
            }, separators=(",", ":"), ensure_ascii=False)
            for r in rows
        ]
        return pa.table({"eve": pa.array(out, pa.large_string())})

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
