"""Keep the driver entry points green: entry() compiles and runs; the
multi-chip dry run works on the virtual 8-device CPU mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    words, byte_lens, overflow = out
    assert not bool(overflow.any())
    assert int(byte_lens[0]) > 0


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
