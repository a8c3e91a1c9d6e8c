"""WebDataset-style tar-shard ingestion: the de-facto container format
for web-scale multimodal training data (Aizman et al., "High-performance
I/O for large-scale deep learning" — tar shards of `key.ext` member
files, all extensions of one key adjacent).

Scale shape: ONE shard = one `read_binary_files` row = parsed inside one
task with stdlib ``tarfile`` over an in-memory buffer — shard-parallel
exactly like WebDataset loaders, no shuffle, no driver involvement. A
100-TB corpus is just more shard files; `batch_size=1` keeps one shard's
payload bytes per task heap at a time (shards are conventionally sized
100 MB-1 GB for this reason).

Row grouping follows the WebDataset convention: member name up to the
FIRST dot is the sample key, the rest is the extension; all members
sharing a key form one sample row. Unknown extensions are preserved —
the ``extensions`` parameter fixes the output schema (binary column per
extension, null when a sample lacks it), which a lazy Dataset needs
up-front."""

from __future__ import annotations

import io
import tarfile

import pyarrow as pa


def _split_key(name: str) -> tuple[str, str]:
    base = name.rsplit("/", 1)[-1]
    dot = base.find(".")
    if dot <= 0:
        return base, ""
    return base[:dot], base[dot + 1:]


def iter_tar_samples(buf: bytes):
    """(key, {ext: payload}) per sample, in shard member order — the
    sequential spec the golden oracle replays; the distributed reader
    must agree with it exactly."""
    cur_key = None
    cur: dict[str, bytes] = {}
    with tarfile.open(fileobj=io.BytesIO(buf)) as tf:
        for m in tf:
            if not m.isfile():
                continue
            key, ext = _split_key(m.name)
            if key != cur_key and cur_key is not None:
                yield cur_key, cur
                cur = {}
            cur_key = key
            cur[ext] = tf.extractfile(m).read()
    if cur_key is not None:
        yield cur_key, cur


def read_tar_shards(path: str, extensions: list[str], *,
                    include_shard: bool = True):
    """Directory (or file list) of ``.tar`` shards → Dataset with one
    row per sample: ``key`` (string) + one binary column per requested
    extension (null when absent) + the originating shard path."""
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        keys, shard_col = [], []
        cols: dict[str, list] = {e: [] for e in extensions}
        for shard_path, buf in zip(batch.column("path").to_pylist(),
                                   batch.column("bytes").to_pylist()):
            for key, members in iter_tar_samples(buf):
                keys.append(key)
                shard_col.append(shard_path)
                for e in extensions:
                    cols[e].append(members.get(e))
        out = {"key": pa.array(keys, pa.string())}
        for e in extensions:
            out[e.replace(".", "_")] = pa.array(cols[e], pa.large_binary())
        if include_shard:
            out["shard"] = pa.array(shard_col, pa.string())
        return pa.table(out)

    # batch_size=1: one shard's bytes per task heap at a time
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_tar_shards(samples, out_dir: str, *, shard_size: int = 64,
                     prefix: str = "shard") -> list[str]:
    """[(key, {ext: payload})] → ``.tar`` shard files of ``shard_size``
    samples each (deterministic member order and metadata, so shards
    are byte-reproducible). Returns the shard paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    chunk: list = []
    idx = 0

    def flush():
        nonlocal chunk, idx
        if not chunk:
            return
        p = os.path.join(out_dir, f"{prefix}-{idx:06d}.tar")
        with tarfile.open(p, "w") as tf:
            for key, members in chunk:
                for ext in sorted(members):
                    data = members[ext]
                    info = tarfile.TarInfo(name=f"{key}.{ext}" if ext
                                           else str(key))
                    info.size = len(data)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(data))
        paths.append(p)
        idx += 1
        chunk = []

    for s in samples:
        chunk.append(s)
        if len(chunk) >= shard_size:
            flush()
    flush()
    return paths
