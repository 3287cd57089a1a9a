#!/bin/bash
# Round-5 hardware pass 4:
#   big8  — retry the 8 MiB VM block (promotion pools m1/m0 now sized
#           from measured counts; the first attempt hit pool exhaustion)
#   b4mb  — binary-4mb revalidation (m1 1024->4096 changed the 4 MiB
#           kernel statics; stream must stay bit-identical, throughput
#           comparable to 0.1044/0.1873)
#   abd3  — decoder budget at config #3 with the new ev2/lit2 duplicated
#           phases (wave-gap closure: the cost is in-kernel; name it)
#   enc32 — L=32 ENCODER attempt with division staging in (the L=16
#           decode remat class is now materialized in both coders)
#
# ONE TPU process at a time; 240 s sleeps (3:00 proved marginal — the
# l16dec stage wedged silently at exactly 3:00 after the prior exit).
# Usage: bash experiments/hw_queue_r5d.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5d
mkdir -p $LOG
want="${*:-bench16r big8 w32bis2 b4mb abd3 enc32}"

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

case " $want " in *" bench16r "*)
  # retry of pass-3 bench16 (it crashed rc=136 infra-side right after
  # the encode rows): decode at L=16 on the qh-staged kernel — THE
  # validation gating the decode default flip
  run bench16r 3600 env X3TPU_VM_LANES_DEC=16 python bench.py ;;
esac
case " $want " in *" big8 "*)
  run big8 3600 python experiments/hw_8mib.py 8 ;;
esac
case " $want " in *" b4mb "*)
  run b4mb 7200 python experiments/bench_matrix.py binary-4mb ;;
esac
case " $want " in *" abd3 "*)
  run abd3 7200 env X3TPU_ABLATE_CORPUS=so \
      X3TPU_ABLATE_SET="full,pay2,ev2,lit2,emit2,row2,dup2,mtf2" \
      python experiments/hw_vm_ablate_dec.py 1 4096 8192 ;;
esac
case " $want " in *" w32bis2 "*)
  # w32 region bisect RERUN with the helper-health control (pass-3 run
  # crashed on every set incl. noscan — indistinguishable from weather)
  run w32bis2 3600 python experiments/hw_w32_bisect.py ;;
esac
case " $want " in *" enc32 "*)
  run enc32 3600 env X3TPU_VM_LANES_ENC=32 \
      python experiments/hw_lanes16_identity.py ;;
esac
echo "QUEUE R5D DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
