#!/bin/sh
# One-shot chip measurement campaign for when the tunnel comes back:
#   1. long self-deadline liveness probe (never externally killed)
#   2. full bench.py with a generous budget  -> /tmp/bench_chip.json
#   3. fwd vs fwd+bwd drag-step probe        -> /tmp/dragstep_chip.log
#      (was the inversion-chunk sweep, shipped in PERF.md earlier in r4)
# Run ALONE (no concurrent pytest — CPU load triples server-side compiles).
# Usage: sh tools/chip_campaign.sh
set -u
cd "$(dirname "$0")/.."

echo "=== campaign start $(date +%H:%M:%S) ==="
python - <<'EOF'
import os, threading, time
T0 = time.time()
def bail():
    time.sleep(900)
    print(f"campaign probe self-exit after {time.time()-T0:.0f}s (wedged)", flush=True)
    os._exit(7)
threading.Thread(target=bail, daemon=True).start()
import jax, jax.numpy as jnp, numpy as np
v = float(np.asarray(jnp.sum(jax.jit(lambda x: x + 1)(jnp.zeros(4)))))
print(f"campaign probe OK: wall {time.time()-T0:.1f}s {jax.devices()[0]}", flush=True)
EOF
rc=$?
if [ $rc -ne 0 ]; then
  echo "tunnel still wedged (rc=$rc); campaign aborted"
  exit $rc
fi

echo "=== bench $(date +%H:%M:%S) ==="
ISHAPE_BENCH_BUDGET_S=2700 ISHAPE_BENCH_NO_PROBE=1 \
  python bench.py >/tmp/bench_chip.json 2>/tmp/bench_chip.err
echo "bench rc=$? (json in /tmp/bench_chip.json)"
tail -c 600 /tmp/bench_chip.json
# a degraded record (value null — tunnel died between probe and bench) is
# not a capture: report failure so a watcher loop keeps trying
python - <<'EOF' || exit 8
import json, sys
last = None
for line in open("/tmp/bench_chip.json"):
    line = line.strip()
    if line.startswith("{"):
        try:
            last = json.loads(line)
        except ValueError:
            pass
if not last or last.get("value") is None:
    print("bench record degraded (value null) — not a chip capture")
    sys.exit(1)
print(f"bench chip capture OK: {last['metric']}={last['value']}")
EOF

echo "=== dragstep probe $(date +%H:%M:%S) ==="
python tools/probe_dragstep.py >/tmp/dragstep_chip.log 2>&1
echo "dragstep rc=$? (log in /tmp/dragstep_chip.log)"
tail -6 /tmp/dragstep_chip.log
echo "=== campaign done $(date +%H:%M:%S) ==="
