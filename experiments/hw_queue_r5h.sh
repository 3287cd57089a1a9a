#!/bin/bash
# Round-5 final pass: the production DEFAULTS end to end (enc L=16,
# dec L=16 — the decode flip landed after hw_queue_r5g validated the
# integer-divider kernel: 16-block cross-decode exact, bench round
# trips, dec 1.1395/1.4245 MB/s at 32/128 lanes).  This run is the
# driver's-eye view and warms the persistent cache for the round-end
# artifact bench.
# Usage: bash experiments/hw_queue_r5h.sh
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5h
mkdir -p $LOG
echo "=== benchdefault ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
timeout 3600 python bench.py > $LOG/benchdefault.log 2>&1
rc=$?
echo "=== benchdefault rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
grep -E '^\{' $LOG/benchdefault.log | tee -a $LOG/queue.log
echo "QUEUE R5H DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
