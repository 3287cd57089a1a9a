#!/bin/bash
# Round-4 THIRD hardware pass (fresh container, cold cache): warm the
# persistent compile cache with the official bench, then retry the rows
# the degraded relay compile helper crashed on in passes 1-2
# (xml/tabular -w32 encode, sweep).  One TPU process at a time;
# 180 s grant-lapse sleeps.  Time-boxed for an end-of-round session.
# Usage: bash experiments/hw_queue_r4c.sh [stage...]
set -u
cd /root/repo
LOG=/tmp/hw_queue_r4c
mkdir -p $LOG
want="${*:-bench retry_w32}"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  tail -4 "$LOG/$name.log" | tee -a $LOG/queue.log
  sleep 180
  return $rc
}

case " $want " in *" bench "*)
  run bench 1800 python bench.py ;;
esac
case " $want " in *" retry_w32 "*)
  run retry_w32 2400 python experiments/bench_matrix.py \
      xml-bigwin tabular-bigwin sweep ;;
esac
echo "QUEUE R4C DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
