#!/bin/bash
# On-chip validation job runner (the mechanism BASELINE.md promises).
#
# Reads jobs from tools/chip_jobs_r3.queue (format: name|budget_s|command),
# runs them SEQUENTIALLY (one shared chip) under `timeout`, and appends
# every job's output + rc to CHIP_JOBS_r3.log with UTC timestamps. Jobs can
# be appended to the queue while the runner is live; it exits once it has
# processed every job line and the queue contains a line "STOP".
#
# Launch:  nohup bash tools/chip_jobs.sh & (or any background shell)
set -u
cd "$(dirname "$0")/.."
QUEUE="${1:-tools/chip_jobs_r3.queue}"
LOG="${2:-CHIP_JOBS_r3.log}"
STATE="${3:-.chip_jobs_done}"
touch "$STATE" "$QUEUE"

export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
export JAX_PLATFORMS=axon

while true; do
    mapfile -t jobs < <(grep -v '^\s*#' "$QUEUE" | grep '|')
    done_n=$(wc -l < "$STATE")
    if [ "$done_n" -ge "${#jobs[@]}" ]; then
        if grep -q '^STOP$' "$QUEUE"; then
            echo "=== [$(date -u +%FT%TZ)] queue drained, STOP found — exiting" >> "$LOG"
            break
        fi
        sleep 20
        continue
    fi
    line="${jobs[$done_n]}"
    name="${line%%|*}"
    rest="${line#*|}"
    budget="${rest%%|*}"
    cmd="${rest#*|}"
    echo "=== [$(date -u +%FT%TZ)] START $name (budget ${budget}s): $cmd" >> "$LOG"
    timeout "$budget" bash -c "$cmd" >> "$LOG" 2>&1
    rc=$?
    echo "=== [$(date -u +%FT%TZ)] END $name rc=$rc" >> "$LOG"
    echo "$name rc=$rc" >> "$STATE"
done
