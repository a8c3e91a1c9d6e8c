"""sagan_ray — a from-scratch Ray-Data-native log/transcript analysis engine.

Re-implements the query/data-processing capabilities of the reference engine
(quadrantsec/sagan, a single-host multi-threaded C syslog analyzer) as an
idiomatic Ray Data pipeline: parse → enrich → classify → correlate → route →
aggregate over Parquet tables of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, tests, bench.py) owns the Ray session.
"""

__version__ = "0.1.0"
