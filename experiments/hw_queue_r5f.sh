#!/bin/bash
# Round-5 hardware pass 6:
#   mx32b  — xml-bigwin / tabular-bigwin matrix rows at the new
#            window-aware dictionary cap (d=6144: below the additive
#            compile cliff found by hw_w32_bisect) — EXPECT engines vm
#            on the encode side for the first time, + C cross-decode
#   l16insb— fresh lockstep divergence signature of the L=16 decoder
#            WITH qh staging (bench16b still fails; capture what
#            changed for the next attempt)
#
# ONE TPU process at a time; 240 s sleeps.
# Usage: bash experiments/hw_queue_r5f.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5f
mkdir -p $LOG
want="${*:-mx32b l16insb}"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  tail -8 "$LOG/$name.log" | tee -a $LOG/queue.log
  sleep 240
  return $rc
}

case " $want " in *" mx32b "*)
  run mx32b 7200 python experiments/bench_matrix.py xml-bigwin \
      tabular-bigwin ;;
esac
case " $want " in *" l16insb "*)
  run l16insb 2700 env X3TPU_VM_LANES=16 \
      python experiments/hw_l16_dec_inspect.py 64 ;;
esac
echo "QUEUE R5F DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
