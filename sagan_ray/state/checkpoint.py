"""Checkpoint / resume helpers: partitioned, manifest-tracked output.

The batch analog of the reference's mmap state persistence
(/root/reference/src/ipc.c:458-733: version-checked state files that
survive restarts — input position is NOT checkpointed there either).
Here, "resumable" means the *output layout* lets a rerun skip finished
partitions (ray_guide 'Sources & sinks' resumability note):

    out_dir/
      <partition>/part-*.parquet     # written atomically per partition
      _manifest.json                 # {partition: {"rows": n, "done": true}}

``partitioned_write`` drives one Ray execution of the dataset and writes
each named partition (e.g. a key range or sink) only if the manifest
doesn't already mark it done.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self._data: dict = {}
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    self._data = json.load(f)
            except (ValueError, OSError):
                self._data = {}

    def done(self, partition: str) -> bool:
        return bool(self._data.get(partition, {}).get("done"))

    def mark(self, partition: str, rows: int) -> None:
        self._data[partition] = {"rows": rows, "done": True}
        self._flush()

    def unmark(self, partition: str) -> None:
        """Clear done BEFORE overwriting an existing partition, so a
        crash mid-swap leaves it flagged for rewrite, never silently
        skipped while its data is gone."""
        if partition in self._data:
            self._data[partition]["done"] = False
            self._flush()

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=0, sort_keys=True)
        os.replace(tmp, self.path)

    def partitions(self) -> dict:
        return dict(self._data)


def partitioned_write(ds, out_dir: str, partition_col: str) -> dict:
    """Write ``ds`` to hive dirs ``out_dir/<partition_col>=<value>/``,
    skipping partitions the manifest already marks done.

    Fully distributed: a map_batches pre-filter drops rows of finished
    partitions (broadcast set of done names), then Ray's partitioned
    parquet writer fans the rest out in parallel; the manifest is updated
    from the written files afterwards. Writes land in a staging dir that
    is renamed into place per partition, so a crash never leaves a
    half-written partition that a resume would then skip."""
    from urllib.parse import unquote

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest = RunManifest(out_dir)
    # sweep staging dirs stranded by crashed prior runs (their partitions
    # are not marked done, so their data gets rewritten below)
    for entry in os.listdir(out_dir):
        if entry.startswith("_stage_"):
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)

    # manifest keys hold the hive-ENCODED dir names ('a b' → 'a%20b',
    # null → '__HIVE_DEFAULT_PARTITION__'); decode before comparing
    # against raw column values
    done_enc = {p.split("=", 1)[1] for p in manifest.partitions()
                if manifest.done(p)}
    null_done = "__HIVE_DEFAULT_PARTITION__" in done_enc
    done_vals = sorted(unquote(v) for v in done_enc
                       if v != "__HIVE_DEFAULT_PARTITION__")

    if done_enc:

        def drop_done(tbl):
            import pyarrow as pa
            col = pc.cast(tbl.column(partition_col), pa.string())
            m = pc.fill_null(
                pc.is_in(col, value_set=pa.array(done_vals, pa.string())),
                null_done)
            if null_done:
                m = pc.or_(m, pc.is_null(col))
            return tbl.filter(pc.invert(pc.fill_null(m, False)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    stage = tempfile.mkdtemp(prefix="_stage_", dir=out_dir)
    ds.write_parquet(stage, partition_cols=[partition_col])

    written: dict[str, int] = {}
    for entry in sorted(os.listdir(stage)):
        if not entry.startswith(f"{partition_col}="):
            continue
        src = os.path.join(stage, entry)
        dst = os.path.join(out_dir, entry)
        rows = sum(pq.ParquetFile(os.path.join(src, f)).metadata.num_rows
                   for f in os.listdir(src) if f.endswith(".parquet"))
        if os.path.exists(dst):
            # unmark → swap aside → swap in: a crash anywhere in here
            # leaves done=False, so the rerun rewrites instead of
            # skipping a deleted partition
            manifest.unmark(entry)
            old = dst + ".old"
            shutil.rmtree(old, ignore_errors=True)
            os.replace(dst, old)
            os.replace(src, dst)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.replace(src, dst)
        written[entry] = rows
        manifest.mark(entry, rows)
    shutil.rmtree(stage, ignore_errors=True)
    return {"written": written, "skipped": [p for p in manifest.partitions()
                                            if p not in written]}
