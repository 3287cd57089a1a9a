#!/bin/bash
# Round-5 hardware pass 7: validate the integer-exact decode divider at
# L=16 (prims.ac_decode_value uses the restoring-loop udiv at LANES > 8
# — replay-proof pure-i32, sidestepping the f32-reassociation remat
# class entirely; the L=8 default path is byte-identical kernels).
#   l16dec2  — full decode of 16 host-encoded blocks at L=16
#   bench16c — bench with decode forced to L=16 (round trip + number;
#              the decode-default flip is gated on BOTH passing)
#
# ONE TPU process at a time; 240 s sleeps.
# Usage: bash experiments/hw_queue_r5g.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5g
mkdir -p $LOG
want="${*:-l16dec2 bench16c}"

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

case " $want " in *" l16dec2 "*)
  run l16dec2 2700 env X3TPU_VM_LANES=16 \
      python experiments/hw_l16_dec_bisect.py ;;
esac
case " $want " in *" bench16c "*)
  run bench16c 3600 env X3TPU_VM_LANES_DEC=16 python bench.py ;;
esac
echo "QUEUE R5G DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
