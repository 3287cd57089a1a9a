#!/bin/bash
# Round-5 hardware pass 1 (verdict items #1/#2/#3):
#   l16ins — lockstep per-event state diff of the LANES=16 decoder
#            miscompile (hw_l16_dec_inspect, dbgdump internals)
#   w32    — does the w32 VM encoder compile with the chunked scan?
#            (fast yes/no probe; full matrix rows run in a later pass)
#   phases — the wave-level decode phase timing probe (committed round 4,
#            never run): init/launch/final split on the binary-4mb twin
#
# Strictly ONE TPU process at a time; the device grant lingers ~2+ min
# after ANY exit (clean included) — 180 s sleeps between stages.
# Usage: bash experiments/hw_queue_r5.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5
mkdir -p $LOG
want="${*:-l16ins w32 phases}"

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

case " $want " in *" l16ins "*)
  # env via `env` (not a prefix assignment, which would leak into later
  # stages through the shell function)
  run l16ins 2700 env X3TPU_VM_LANES=16 \
      python experiments/hw_l16_dec_inspect.py 48 dbgdump ;;
esac
case " $want " in *" w32 "*)
  run w32 3600 python experiments/hw_w32_compile.py 16 16 ;;
esac
case " $want " in *" phases "*)
  run phases 3600 python experiments/hw_wave_phases.py 4 ;;
esac
echo "QUEUE R5 DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
