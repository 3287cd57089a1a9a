#!/bin/bash
# Round-5 hardware pass 5: after reverting the encoder-side staging
# (which corrupted L=16 encode streams -> the bench16 rc=136 crashes):
#   l16id   — enc L=16 identity probe (expect byte-identical again; the
#             kernel is back to the round-4-validated form)
#   bench16b— bench with decode forced to L=16: the DECODER qh-staging
#             validation (decoder staging is hardware-proven at L=8 by
#             big8/b4mb round trips; this is the L=16 test).  The host
#             decoder is now corrupt-stream-hardened, so a bad stream
#             reports instead of killing the process.
#
# ONE TPU process at a time; 240 s sleeps.
# Usage: bash experiments/hw_queue_r5e.sh [stage...]   (default: all)
set -u
cd /root/repo
LOG=/tmp/hw_queue_r5e
mkdir -p $LOG
want="${*:-l16id bench16b bench32 w32bis3}"

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

case " $want " in *" l16id "*)
  run l16id 2700 python experiments/hw_lanes16_identity.py ;;
esac
case " $want " in *" bench16b "*)
  run bench16b 3600 env X3TPU_VM_LANES_DEC=16 python bench.py ;;
esac
case " $want " in *" w32bis3 "*)
  # deeper w32/d8192 bisect: minimal kernel, D-sweep, window-sweep
  run w32bis3 3600 python experiments/hw_w32_bisect.py \
      noscan+nosweep+noprobe+nodma d=2048 d=4096 d=6144 w=16384 \
      w=16384+noscan ;;
esac
case " $want " in *" bench32 "*)
  # L=32 encode throughput (enc32 identity probe: all 24 streams
  # byte-identical at enc lanes 32 — the L>16 miscompile healed)
  run bench32 3600 env X3TPU_VM_LANES_ENC=32 python bench.py ;;
esac
echo "QUEUE R5E DONE $(date +%H:%M:%S)" | tee -a $LOG/queue.log
