#!/bin/bash
# Timing-sweep driver: runs the 260-row sweep (experiment_list.c:364-409
# analogue, harness indices 50-309) as PAIRED subprocesses.
#
# The central and decentral rows of the same (vertex count, light config,
# technique) cell share an IDENTICAL jit signature (the light layout is
# runtime data, not a static argument), so running them in one subprocess
# costs ONE compile for two rows. The axon TPU platform wedges after ~2-3
# DISTINCT compiled frame programs per process (CLAUDE.md), which one
# program run twice does not trigger.
#
# Pair cost is compile-dominated and varies 3-15+ min by technique, so the
# driver is PHASED for graceful truncation: all vertex counts' 128-light
# pairs first (completes the per-vertex-count scaling story for both the
# central and decentral axes), then the 1-light 128-spp pairs. Pairs whose
# two rows already sit in results/results.csv are skipped, so the driver
# is idempotent and restartable.
#
# Usage: tools/run_sweep_pairs.sh   (vc order 4 6 3 7; vc 5 was committed
# in round 4 with the default 110/100-frame protocol. These runs use 10
# warmup / 16 measured frames: the pipelined median is stable well before
# 16 frames at the sweep's 150-1000 ms frame times.)
set -u
cd "$(dirname "$0")/.."
WARM=10
MEAS=16
CSV=results/results.csv
# Dead-man's switch: no NEW pair starts after the deadline (epoch seconds,
# env SWEEP_DEADLINE, default +95 min). The end-of-round driver runs
# bench.py on the same TPU; an unattended sweep running into that window
# re-creates r4's contended 4x-wrong official number. A mid-pair overrun
# is bounded by the per-pair `timeout 1800`.
DEADLINE=${SWEEP_DEADLINE:-$(( $(date +%s) + 95 * 60 ))}

have_row() {
  awk -F, -v i="$1" 'NR>1 && $1==i {found=1} END {exit !found}' "$CSV"
}

run_pair() {
  a=$1; b=$2
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "sweep deadline reached — stopping before pair $a/$b"
    exit 0
  fi
  if have_row $a && have_row $b; then
    echo "pair $a/$b already recorded — skip"
    return 0
  fi
  for attempt in 1 2; do
    timeout 1800 python -m vulkan_renderer_tpu.experiments.harness \
      -e $a $b --no-isolate --warmup-frames $WARM --measure-frames $MEAS
    rc=$?
    if [ $rc -eq 0 ]; then
      # Evidence must not evaporate with the working tree (round 4 lost
      # 25 uncommitted rows to the end-of-round snapshot): commit the
      # sweep CSV after every completed pair, results.csv only.
      if ! git diff --quiet -- results/results.csv; then
        git add results/results.csv \
          && git commit -q -m "Sweep rows $a/$b" -- results/results.csv \
          || true
      fi
      return 0
    fi
    echo "pair $a/$b attempt $attempt rc=$rc" >&2
    sleep 60  # wedged-relay cooldown before the retry
  done
}

# Phase 1: 128 lights x 1 spp (pair index offsets 0..12).
# vc 5 leads: its cells are committed except pairs purged for the pre-fix
# double-stamp timer artifact (T/2 medians) — idempotent skipping makes
# revisiting it nearly free.
for vc in 5 4 6 3 7; do
  base=$((50 + (vc - 3) * 52))
  for i in $(seq 0 12); do
    run_pair $((base + i)) $((base + 26 + i))
  done
done
# Phase 2: 1 light x 128 spp (offsets 13..25).
for vc in 5 4 6 3 7; do
  base=$((50 + (vc - 3) * 52))
  for i in $(seq 13 25); do
    run_pair $((base + i)) $((base + 26 + i))
  done
done
