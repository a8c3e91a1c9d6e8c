from .checkpoint import RunManifest, partitioned_write  # noqa: F401
