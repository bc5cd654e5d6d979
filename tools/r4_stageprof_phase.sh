#!/bin/bash
# Round-4 campaign phase 2 (rerun after ENOSPC): stage-level A/B of the
# one-shuffle vs two-pass coref shape at 2 and 8 cores, 26M-turn corpus.
set -u
cd /root/repo
for c in 2 8; do
  sbt -batch "runMain graft.StageProfile 4000000 $c" \
    > bench_evidence/r4_stageprof_oneshot_$c.log 2>&1
  echo "[campaign] stageprof oneshot cpus=$c done $(date -u +%H:%M:%S)"
  GRAFT_COREF_TWOPASS=1 sbt -batch "runMain graft.StageProfile 4000000 $c" \
    > bench_evidence/r4_stageprof_twopass_$c.log 2>&1
  echo "[campaign] stageprof twopass cpus=$c done $(date -u +%H:%M:%S)"
  df -h / | tail -1
done
echo "[campaign] STAGEPROF DONE $(date -u +%H:%M:%S)"
