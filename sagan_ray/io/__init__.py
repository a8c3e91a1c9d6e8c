from .sinks import eve_format_batch, write_sinks  # noqa: F401
