#!/bin/bash
# Round-4 SECOND hardware pass: re-measure after the cumulative-row-freqs
# kernel (rows.py rewrite) landed, and retry the rows the degraded relay
# compile helper crashed on during pass 1 (xml/tabular -w32 encode, sweep).
# One TPU process at a time; 180 s grant-lapse sleeps.
# Usage: bash experiments/hw_queue_r4b.sh [stage...]
set -u
cd /root/repo
LOG=/tmp/hw_queue_r4b
mkdir -p $LOG
want="${*:-bench matrix3 ablate_dec lanes16id lanes16bench retry_w32 benchfinal}"

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
  run bench 3000 python bench.py || exit 1 ;;
esac
case " $want " in *" matrix3 "*)
  # the cumulative-rows A/B on config #3 (decode esp.) + binary 128K
  run matrix3 10800 python experiments/bench_matrix.py binary binary-4mb ;;
esac
case " $want " in *" ablate_dec "*)
  # confirm pay2 (row_decode_pos) shrank from +9.6 us
  run ablate_dec 4800 env X3TPU_ABLATE_CORPUS=bench \
      X3TPU_ABLATE_SET="full,pay2,dup2" \
      python experiments/hw_vm_ablate_dec.py 32 16 8192 ;;
esac
case " $want " in *" lanes16id "*)
  # pass-1 surprise: vm_tpu_smoke at LANES=16 round-tripped (rc=0) after
  # failing every round — verify with the STRONG check (streams vs host)
  run lanes16id 3600 env X3TPU_VM_LANES=16 \
      python experiments/hw_lanes16_identity.py ;;
esac
case " $want " in *" lanes16bench "*)
  # if identity holds, the 16-lane group A/B at the bench config
  run lanes16bench 3600 env X3TPU_VM_LANES=16 X3TPU_BENCH_SCALING=0 \
      python bench.py ;;
esac
case " $want " in *" retry_w32 "*)
  # pass-1 helper crashes (xml/tabular -w32 encode, sweep) — intermittent
  run retry_w32 10800 python experiments/bench_matrix.py \
      xml-bigwin tabular-bigwin sweep ;;
esac
case " $want " in *" benchfinal "*)
  run benchfinal 3000 python bench.py ;;
esac
echo "QUEUE R4B DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
