#!/bin/bash
# Chip-recovery watcher (round 4): the axon tunnel has been down since late
# round 3; every backend init hangs or returns UNAVAILABLE. This loop waits
# for an existing bench supervisor (pid in $1) to exit, then repeatedly runs
# the full bench (its supervisor handles per-attempt timeouts, fresh-process
# retries, and the tiny-CPU fallback) until a REAL non-tiny result records,
# then runs the seg-train measurement suite (VERDICT r3 items 4+6) once.
#
# Bounded: stops after WATCH_S seconds (default 6h) so it cannot collide
# with the driver's own end-of-round bench. Writes its pid to
# /tmp/chip_watch.pid — kill $(cat /tmp/chip_watch.pid) to stop early.
set -u
cd /root/repo
echo $$ > /tmp/chip_watch.pid
WATCH_S=${WATCH_S:-21600}
T0=$(date +%s)

while [ -n "${1:-}" ] && ps -p "$1" >/dev/null 2>&1; do sleep 60; done

i=0
while [ $(( $(date +%s) - T0 )) -lt "$WATCH_S" ]; do
  i=$((i + 1))
  DIE_BENCH_DEADLINE_S=4500 python bench.py \
    > "/tmp/bench_watch_$i.json" 2> "/tmp/bench_watch_$i.err"
  if grep -q '"value": [0-9]' "/tmp/bench_watch_$i.json" \
     && ! grep -q 'TINY CPU FALLBACK' "/tmp/bench_watch_$i.json"; then
    cp "/tmp/bench_watch_$i.json" /root/repo/BENCH_MANUAL_r04b.json
    echo "real bench recorded on watch iteration $i" >&2
    # seg-train matrix already recorded (SEG_TRAIN_r04.log); remaining chip
    # items are the int8 conv survey + an int8 headline A/B (PARITY r4 tail).
    timeout 2400 python scripts/conv_survey.py \
      > /tmp/conv_survey_int8.log 2>&1
    echo "conv survey done (rc=$?)" >&2
    DIE_TPU_CONV=int8 DIE_BENCH_PHASES=headline DIE_BENCH_DEADLINE_S=1800 \
      python bench.py > /tmp/bench_int8.json 2> /tmp/bench_int8.err
    echo "int8 headline A/B done (rc=$?)" >&2
    exit 0
  fi
  sleep 300
done
echo "watch window expired without a real-backend result" >&2
exit 1
