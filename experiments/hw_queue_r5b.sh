#!/bin/bash
# Round-5 hardware pass 2:
#   l16clean — the L=16 decoder lockstep state diff WITHOUT dbgdump
#              (pass 1: with the dump barrier the first 3 events were
#              IDENTICAL to interpret — the dump's forced
#              materialization masks the remat bug; this run diffs the
#              clean kernel per event to find the first diverging array)
#   mx32     — the two formerly-demoted matrix rows (xml-bigwin /
#              tabular-bigwin) on the chunked-scan VM encoder, with
#              C-binary cross-decode
#   big8     — 8 MiB text block on the VM: host-lockstep stream identity
#              + round trip (the new 8-16 MiB caps regime)
#
# Strictly ONE TPU process at a time; 180 s sleeps between stages.
# Usage: bash experiments/hw_queue_r5b.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5b
mkdir -p $LOG
want="${*:-l16clean mx32 big8 phases2}"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  tail -8 "$LOG/$name.log" | tee -a $LOG/queue.log
  sleep 180
  return $rc
}

case " $want " in *" l16clean "*)
  run l16clean 2700 env X3TPU_VM_LANES=16 \
      python experiments/hw_l16_dec_inspect.py 64 ;;
esac
case " $want " in *" mx32 "*)
  run mx32 7200 python experiments/bench_matrix.py xml-bigwin \
      tabular-bigwin ;;
esac
case " $want " in *" big8 "*)
  run big8 3600 python experiments/hw_8mib.py 8 ;;
esac
case " $want " in *" phases2 "*)
  # per-launch dissection on the REAL binary-4mb corpus (pass-1 phases
  # falsified init/final; the gap is inside the launches)
  run phases2 3600 python experiments/hw_wave_phases.py 4 so perlaunch ;;
esac
echo "QUEUE R5B DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
