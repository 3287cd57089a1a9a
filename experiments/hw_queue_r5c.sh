#!/bin/bash
# Round-5 hardware pass 3: validate the L=16 decoder step-staging fix
# (prims.ac_decode_value stage hook; the step-remat miscompile was
# localized by hw_l16_dec_inspect pass 2: regsi low/high diverging by
# step_diff*plow at event 2 with models/buf/bitpos identical).
#   l16fix  — lockstep state diff, 64 single-event launches, EXPECT
#             "no divergence"
#   l16dec  — full decode of 16 host-encoded blocks at L=16 (the
#             round-4 failure mode; EXPECT "ALL ... CORRECT")
#   bench16 — official bench with the decode width forced to 16
#             (decode@128 target >= 1.45 MB/s per the round-4 verdict)
#
# Strictly ONE TPU process at a time; 180 s sleeps between stages.
# Usage: bash experiments/hw_queue_r5c.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5c
mkdir -p $LOG
want="${*:-l16fix l16dec bench16 w32bis}"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  tail -6 "$LOG/$name.log" | tee -a $LOG/queue.log
  sleep 180
  return $rc
}

case " $want " in *" l16fix "*)
  run l16fix 2700 env X3TPU_VM_LANES=16 \
      python experiments/hw_l16_dec_inspect.py 64 ;;
esac
case " $want " in *" l16dec "*)
  run l16dec 2700 env X3TPU_VM_LANES=16 \
      python experiments/hw_l16_dec_bisect.py ;;
esac
case " $want " in *" bench16 "*)
  run bench16 3600 env X3TPU_VM_LANES_DEC=16 python bench.py ;;
esac
case " $want " in *" w32bis "*)
  # compile-region bisect of the w32/d8192 helper crash (ablate sets)
  run w32bis 3600 python experiments/hw_w32_bisect.py ;;
esac
echo "QUEUE R5C DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
