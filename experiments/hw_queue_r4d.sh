#!/bin/bash
# Round-4 FOURTH hardware pass: validate the per-direction lane widths
# (enc L=16 / dec L=8 is the new TPU default) through the production
# dispatch — stream identity vs the host codec first, then the official
# bench.  One TPU process at a time; 180 s grant-lapse sleeps.
# Usage: bash experiments/hw_queue_r4d.sh [stage...]
set -u
cd /root/repo
LOG=/tmp/hw_queue_r4d
mkdir -p $LOG
want="${*:-l16id benchdefault}"

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

case " $want " in *" l16id "*)
  # no env: the probe now exercises the backend-default enc=16/dec=8
  run l16id 1800 python experiments/hw_lanes16_identity.py || exit 1 ;;
esac
case " $want " in *" benchdefault "*)
  run benchdefault 1800 python bench.py ;;
esac
echo "QUEUE R4D DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
