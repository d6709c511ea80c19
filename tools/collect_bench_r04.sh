#!/bin/bash
# Round-4 honest measurement campaign: every BASELINE config + the
# roofline / scaling / decoders / ingest harnesses, one TPU process at
# a time (attachment constraint), JSON lines accumulated into
# BENCH_full_r04.json by tools/merge_bench_r04.py.
cd /root/repo
LOG=/tmp/bench_campaign.log
OUT=/tmp/bench_campaign_lines.jsonl
: > "$OUT"
for mode in resampler_agc spectral music bank roofline decoders; do
  echo "=== $mode ===" >> "$LOG"
  timeout 1100 python -u benchmarks.py "$mode" > /tmp/bc_$mode.out 2>> "$LOG"
  rc=$?
  echo "rc=$rc" >> "$LOG"
  grep "^{" /tmp/bc_$mode.out >> "$OUT"
  sleep 20
done
echo "=== ingest ===" >> "$LOG"
timeout 600 python -u benchmarks.py ingest > /tmp/bc_ingest.out 2>> "$LOG"
echo "rc=$?" >> "$LOG"
grep "^{" /tmp/bc_ingest.out >> "$OUT"
echo "=== scaling (cpu) ===" >> "$LOG"
timeout 580 python -u benchmarks.py scaling > /tmp/bc_scaling.out 2>> "$LOG"
grep "^{" /tmp/bc_scaling.out >> "$OUT"
echo "CAMPAIGN DONE" >> "$LOG"
