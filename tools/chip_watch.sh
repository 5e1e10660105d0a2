#!/bin/sh
# Persistent tunnel watcher: loop tools/chip_campaign.sh until it lands a
# chip capture or the budget runs out. Every chip touch inside the campaign
# is a SELF-exiting client (daemon-timer os._exit) — nothing here kills a
# client externally, which would deepen a wedge (docs/PERF.md "Round-4
# tunnel status"). Probe attempts are spaced >= 900 s apart: rapid
# back-to-back sessions degrade the tunnel server's compile backlog.
#
# Usage: sh tools/chip_watch.sh   (run ALONE; writes /tmp/chip_watch.status)
set -u
cd "$(dirname "$0")/.."
BUDGET_S=${ISHAPE_WATCH_BUDGET_S:-36000}
END=$(( $(date +%s) + BUDGET_S ))
i=0
echo "watching" > /tmp/chip_watch.status
while [ "$(date +%s)" -lt "$END" ]; do
  i=$((i+1))
  echo "=== watch attempt $i $(date -u +%H:%M:%S) ==="
  if sh tools/chip_campaign.sh; then
    echo "campaign-succeeded attempt=$i" > /tmp/chip_watch.status
    echo "=== watch done: campaign succeeded on attempt $i ==="
    exit 0
  fi
  echo "attempt $i failed; sleeping 900s"
  sleep 900
done
echo "budget-exhausted attempts=$i" > /tmp/chip_watch.status
echo "=== watch done: budget exhausted after $i attempts ==="
exit 1
