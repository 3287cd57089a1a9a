#!/bin/bash
# Round-4 hardware validation queue (round-3 verdict #1/#2/#3/#5):
# refresh EVERY throughput claim on the shipping kernel (gated probe +
# cumulative index model), both directions, C-binary cross-decode; run
# the first-ever decoder ablation; revalidate LANES=16.
#
# Strictly ONE TPU process at a time; the device grant lingers ~2+ min
# after ANY exit (clean included) — 180 s sleeps between stages.
# Usage: bash experiments/hw_queue_r4.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r4
mkdir -p $LOG
want="${*:-bench matrix sweep ablate_enc ablate_dec ablate_enc3 ablate_dec3 lanes16 benchfinal}"

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
  # official driver config first: warms the persistent cache for the
  # driver's own cold bench run (VMCaps grew a field -> full recompiles)
  run bench 2400 python bench.py || exit 1 ;;
esac
case " $want " in *" matrix "*)
  # BASELINE config matrix refresh: text/text-1blk/xml/tabular/binary +
  # binary-4mb (config #3 — the gated-probe + cumulative-ixf A/B:
  # round-3 numbers were 0.0950 enc / 0.0696 dec MB/s), enc AND dec,
  # C-binary cross-decode per row
  run matrix 10800 python experiments/bench_matrix.py \
      text text-1blk xml-bigwin tabular-bigwin binary binary-4mb ;;
esac
case " $want " in *" sweep "*)
  # config #4 proxy; crashed once on a transient relay-side HTTP 500
  # (round 3) — re-queued here
  run sweep 7200 python experiments/bench_matrix.py sweep ;;
esac
case " $want " in *" ablate_enc "*)
  # encoder budget on the shipping kernel, official corpus/config
  run ablate_enc 4800 env X3TPU_ABLATE_CORPUS=bench \
      python experiments/hw_vm_ablate.py 32 16 8192 ;;
esac
case " $want " in *" ablate_dec "*)
  # FIRST decoder ablation (round-3 verdict #5), duplicated-phase deltas
  run ablate_dec 4800 env X3TPU_ABLATE_CORPUS=bench \
      python experiments/hw_vm_ablate_dec.py 32 16 8192 ;;
esac
case " $want " in *" ablate_enc3 "*)
  # config #3 encoder budget (1 lane x 4 MB binary, D=24576); each
  # ablation is its own giant remote compile -> trimmed set
  run ablate_enc3 7200 env X3TPU_ABLATE_CORPUS=so \
      X3TPU_ABLATE_SET="full,noprobe,noscan,nosweep" \
      python experiments/hw_vm_ablate.py 1 4096 8192 ;;
esac
case " $want " in *" ablate_dec3 "*)
  # config #3 decoder budget (the round-3 enc>dec inversion explanation)
  run ablate_dec3 7200 env X3TPU_ABLATE_CORPUS=so \
      X3TPU_ABLATE_SET="full,pay2,dup2,mtf2,emit2" \
      python experiments/hw_vm_ablate_dec.py 1 4096 8192 ;;
esac
case " $want " in *" lanes16 "*)
  # L>8 miscompile revalidation (CLAUDE.md: re-check on toolchain bumps)
  run lanes16 2400 env X3TPU_VM_LANES=16 python experiments/vm_tpu_smoke.py ;;
esac
case " $want " in *" benchfinal "*)
  # final official-config run: fresh steady-state numbers on a warm cache
  run benchfinal 2400 python bench.py ;;
esac
echo "QUEUE R4 DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
