"""Codec-VM: the whole x3 event loop as one Pallas TPU kernel per chunk.

Removes the ~450 us/event XLA op-dispatch floor measured in round 1
(BENCH_NOTES.md) by keeping all adaptive codec state resident on-chip and
fetching context rows by per-event DMA.  Bit-exact with the XLA codec and
the reference binary (tests/test_vm.py).
"""

from x3tpu.vm.config import VMCaps, VMUnsupported, vm_caps
from x3tpu.vm.driver import (
    decode_blocks_vm_chunked,
    decode_blocks_vm_sharded,
    encode_blocks_vm_chunked,
    encode_blocks_vm_sharded,
)

__all__ = [
    "VMCaps",
    "VMUnsupported",
    "vm_caps",
    "decode_blocks_vm_chunked",
    "decode_blocks_vm_sharded",
    "encode_blocks_vm_chunked",
    "encode_blocks_vm_sharded",
]
