#!/usr/bin/env bash
# Submit the flagship transcript pipeline as a Ray job.
#
# Multi-node (north_rule: ray job submit to fixed N / 4N-node
# clusters; set RAY_ADDRESS to the head node's dashboard address):
#
#   RAY_ADDRESS=http://head:8265 ./scripts/submit_job.sh \
#       /data/transcripts /data/out --resumable
#
# Sandbox/local fallback: runs the module directly in a local session
# when no remote RAY_ADDRESS is configured.
set -euo pipefail

INPUT="${1:?usage: submit_job.sh INPUT_DIR OUTPUT_DIR [extra args]}"
OUTPUT="${2:?usage: submit_job.sh INPUT_DIR OUTPUT_DIR [extra args]}"
shift 2

if [[ "${RAY_ADDRESS:-local}" != "local" && "${RAY_ADDRESS:-}" == http* ]]; then
    exec ray job submit --working-dir "$(dirname "$0")/.." -- \
        python -m vrl_ray.job --input "$INPUT" --output "$OUTPUT" "$@"
else
    exec python -m vrl_ray.job --input "$INPUT" --output "$OUTPUT" "$@"
fi
