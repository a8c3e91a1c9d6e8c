"""Transcript Parquet source.

The File_Input / GZIP_Input analog (reference src/input-plugins/file.c:
56-222, gzip.c): Ray's ``read_parquet`` supplies the sharding, batching
and decompression the reference hand-rolls; the ignore-list / validity
pre-filter lives in the classify stage (cheap short-circuit before rule
evaluation, as file.c:140-150 applies Ignore before batching).
"""

from __future__ import annotations

from ..synth import SCHEMA

COLUMNS = [f.name for f in SCHEMA]


def read_transcripts(path: str, *, columns=None, override_num_blocks=None):
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, columns=columns or COLUMNS,
                           file_extensions=["parquet"], **kwargs)
