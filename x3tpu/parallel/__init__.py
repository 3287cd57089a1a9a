"""Block-data-parallel runtime: device mesh, sharded codec execution, block
splitting and the multi-block container format.

The reference is single-threaded (SURVEY.md §2); this subsystem is new.
The only parallelism axis the format's sequential adaptive state admits is
*independent blocks*, so scale comes from sharding blocks over lanes x
chips x hosts and gathering variable-length compressed payloads in order.
"""
