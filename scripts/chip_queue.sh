#!/bin/bash
# Sequential TPU job queue.
#
# The axon tunnel wedges when two TPU processes overlap or start
# back-to-back (CLAUDE.md "Environment gotchas"), so every on-chip run in
# this repo goes through this runner: it executes data/queue/*.job files
# one at a time in lexicographic order, logs to data/logs/queue/<name>.log,
# and sleeps 90 s between jobs.  Drop new .job files in while it runs;
# touch data/queue/STOP to make it exit once the queue drains.
#
# Each .job file is a bash script run from /root/repo with
# PYTHONPATH=/root/repo:/root/.axon_site (the tunnel sitecustomize).  Wrap
# long python invocations in `timeout` so a wedged tunnel can't block the
# queue forever.

QUEUE=/root/repo/data/queue
LOGS=/root/repo/data/logs/queue
mkdir -p "$QUEUE" "$QUEUE/done" "$LOGS"
cd /root/repo || exit 1

while true; do
    job=$(ls "$QUEUE"/*.job 2>/dev/null | sort | head -1)
    if [ -z "$job" ]; then
        if [ -e "$QUEUE/STOP" ]; then
            rm -f "$QUEUE/STOP"
            echo "chip_queue: STOP seen, exiting at $(date)"
            exit 0
        fi
        sleep 20
        continue
    fi
    name=$(basename "$job" .job)
    running="$QUEUE/$name.running"
    mv "$job" "$running"
    echo "chip_queue: starting $name at $(date)"
    PYTHONPATH=/root/repo:/root/.axon_site \
        bash "$running" >"$LOGS/$name.log" 2>&1
    echo "exit=$? at $(date)" >>"$LOGS/$name.log"
    mv "$running" "$QUEUE/done/$name.job"
    echo "chip_queue: finished $name at $(date)"
    sleep 90   # tunnel cool-down between TPU processes
done
