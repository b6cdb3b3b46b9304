#!/usr/bin/env bash
# Members-vs-throughput table for the SD LoRA ensemble bench (VERDICT
# round-3 ask #8): with the round-4 direction-mixed attention dispatch and
# selective-conv remat, how many concurrent LoRA members fit one v5e chip,
# and does passes/hour keep scaling? Each config is one full bench_sd run
# (200 LoRA steps x batch 64 + 50-image 100-step DDIM per member, exact
# reference recipe); results append to docs/sd_members_table.jsonl.
set -uo pipefail
mkdir -p docs
for m in "$@"; do
  echo "=== SD_MEMBERS=$m ==="
  SD_MEMBERS=$m timeout 2400 python bench_sd.py 2>&1 | tee /tmp/bench_sd_m$m.out
  grep '"metric"' /tmp/bench_sd_m$m.out | tail -1 >> docs/sd_members_table.jsonl || \
    echo "{\"members\": $m, \"error\": \"no result (OOM or timeout); see /tmp/bench_sd_m$m.out\"}" >> docs/sd_members_table.jsonl
done
