#!/usr/bin/env bash
# Cluster submission path (`ray job submit`) for the engine pipeline —
# the production entry the north rule describes. This sandbox runs Ray in
# local mode without the dashboard/job server, so the script documents the
# real-cluster invocation and falls back to a direct run locally.
#
# On a cluster (head node address in RAY_ADDRESS, e.g. http://head:8265):
#
#   ray job submit \
#     --address "$RAY_ADDRESS" \
#     --working-dir . \
#     --runtime-env-json '{"py_modules": ["./sagan_ray"]}' \
#     -- python tools/run_engine_job.py \
#          --input  s3://bucket/transcripts/   \
#          --rules  rulesets/                  \
#          --output s3://bucket/alerts/        \
#          --buckets 4096
#
# Resumability: the output layout (hive dirs + _manifest.json, see
# sagan_ray/state/checkpoint.py) lets a resubmitted job skip finished
# sink partitions.

set -euo pipefail
cd "$(dirname "$0")/.."

if command -v ray >/dev/null && [ -n "${RAY_JOB_ADDRESS:-}" ]; then
  exec ray job submit --address "$RAY_JOB_ADDRESS" --working-dir . \
    -- python tools/run_engine_job.py "$@"
else
  echo "[submit_job] no job server (sandbox local mode) — running directly" >&2
  exec python tools/run_engine_job.py "$@"
fi
