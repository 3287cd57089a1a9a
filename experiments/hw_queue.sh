#!/bin/bash
# Hardware validation queue for the round-2 late additions (huge tier,
# mesh-VM, async dispatch).  Runs the moment the axon relay returns;
# strictly ONE TPU process at a time (sequential stages, each logged).
# Usage: bash experiments/hw_queue.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue
mkdir -p $LOG
want="${*:-sanity huge big matrix4 sweep lanes16 bench}"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $LOG/queue.log
  tail -3 "$LOG/$name.log" | tee -a $LOG/queue.log
  # the device grant lingers ~2 min after the previous process exits —
  # EVEN after a clean rc=0 exit (measured 2026-08-20: a stage started
  # 2:00 after a clean exit wedged at its first device op, 0 progress
  # in 12 min).  Always let it lapse before the next stage.
  sleep 180
  return $rc
}

case " $want " in *" sanity "*)
  # quick device sanity + bench compile-cache warmup at the driver config
  run sanity 2400 python bench.py || exit 1 ;;
esac
case " $want " in *" huge "*)
  run huge 3600 python experiments/hw_vm_huge.py ;;
esac
case " $want " in *" big "*)
  run big 5400 python experiments/hw_vm_huge.py --big ;;
esac
case " $want " in *" matrix4 "*)
  run matrix4 7200 python experiments/bench_matrix.py binary-4mb ;;
esac
case " $want " in *" sweep "*)
  run sweep 7200 python experiments/bench_matrix.py sweep ;;
esac
case " $want " in *" lanes16 "*)
  # L>8 miscompile revalidation (CLAUDE.md: re-check on toolchain bumps)
  run lanes16 2400 env X3TPU_VM_LANES=16 python experiments/vm_tpu_smoke.py ;;
esac
case " $want " in *" bench "*)
  # final official-config run so the driver's cold bench hits a warm cache
  run bench 2400 python bench.py ;;
esac
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
