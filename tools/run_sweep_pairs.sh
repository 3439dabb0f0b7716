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
# Usage: tools/run_sweep_pairs.sh [vc ...]   (default: 4 6 3 7; vc 5 was
# committed in round 4 with the default 110/100-frame protocol. These
# runs use 10 warmup / 16 measured frames: the per-row cost is dominated
# by the per-process XLA compile, and the pipelined median is stable well
# before 16 frames at the sweep's 150-1000 ms frame times.)
set -u
cd "$(dirname "$0")/.."
VCS=("${@:-4 6 3 7}")
WARM=10
MEAS=16
for vc in ${VCS[@]}; do
  base=$((50 + (vc - 3) * 52))
  # 128-light 1spp pairs, then 1-light 128spp pairs.
  for i in $(seq 0 12) $(seq 13 25); do
    a=$((base + i)); b=$((base + 26 + i))
    for attempt in 1 2; do
      timeout 1500 python -m vulkan_renderer_tpu.experiments.harness \
        -e $a $b --no-isolate --warmup-frames $WARM --measure-frames $MEAS
      rc=$?
      [ $rc -eq 0 ] && break
      echo "pair $a/$b attempt $attempt rc=$rc" >&2
      sleep 60  # wedged-relay cooldown before the retry
    done
  done
done
