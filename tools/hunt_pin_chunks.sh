#!/bin/bash
# Coverage-driven pin-chunk hunter (round 12): captures the full
# headline set as per-family certified chunks across short healthy
# host windows, then the composite pin assembles from the artifacts.
#
# Each cycle asks tools/assemble_pin.py --missing-tokens which
# headline queries certified chunks don't yet provide, attempts
# exactly those under bench.py --pin-intent (loaded-steal pre-flight,
# per-family abort-resume), keeps the attempt only if it certifies
# (partials from aborted windows count), and stops when coverage is
# complete. This is how BENCH_PIN_r11.json's twelve chunks in
# pin_evidence_r11/ were captured — windows on this VM run shorter
# than the ~8-minute monolithic bench, so the monolithic path starved
# (six failed certifications in round 11).
#
# Usage:
#   tools/hunt_pin_chunks.sh [deadline_seconds]   # default 3h
#   # ... then:
#   python tools/assemble_pin.py BENCH_CHUNK_*.json --out BENCH_PIN_rN.json
set -u
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + ${1:-10800} ))
LOG=${HUNT_LOG:-/tmp/pin_chunks.log}
N=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  TOKENS=$(python tools/assemble_pin.py --missing-tokens BENCH_CHUNK_*.json 2>/dev/null)
  if [ -z "$TOKENS" ]; then
    echo "$(date -u +%H:%M:%S) COVERAGE COMPLETE" | tee -a "$LOG"
    exit 0
  fi
  N=$((N+1))
  OUT="BENCH_CHUNK_fill_$N.json"
  echo "$(date -u +%H:%M:%S) attempt $N tokens=$TOKENS" >> "$LOG"
  timeout 2400 python bench.py --pin-intent --wait-secs 300 \
    --families "$TOKENS" --out "$OUT" >/dev/null 2>>"$LOG"
  rc=$?
  if [ -f "$OUT" ] && python tools/assemble_pin.py --status "$OUT" 2>/dev/null | grep -q ": CERTIFIED"; then
    echo "$(date -u +%H:%M:%S) attempt $N rc=$rc CERTIFIED" >> "$LOG"
  else
    echo "$(date -u +%H:%M:%S) attempt $N rc=$rc rejected" >> "$LOG"
    rm -f "$OUT"
    sleep 30
  fi
done
echo "$(date -u +%H:%M:%S) DEADLINE reached" | tee -a "$LOG"
exit 1
