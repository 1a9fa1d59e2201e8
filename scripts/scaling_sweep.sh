#!/bin/bash
# Re-measure the scaling table on the real chip (run sizes sequentially;
# chunk lengths sized to stay well under the ~2 min per-call watchdog).
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
# world_half auto-fits per size (devbench argv[4] defaults to 0 = auto),
# so the 500k/1M rows run hands-free
for spec in "1000 60000" "4000 60000" "10000 60000" "40000 24000" \
            "100000 12000" "250000 6000" "500000 3000" "1000000 3000"; do
  set -- $spec
  echo "=== n=$1 steps/chunk=$2"
  python scripts/devbench.py "$1" "$2" 2 2>&1 | grep -v WARNING
done
