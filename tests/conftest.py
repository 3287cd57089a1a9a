"""Shared test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding tests run
without TPU hardware (the standard JAX trick; SURVEY.md §4).  Must run
before jax is imported anywhere.
"""

import os
import pathlib
import subprocess

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the TPU ('axon') backend at
# interpreter startup, so env vars alone don't reach jax; flip the platform
# explicitly before any computation runs.  Set X3TPU_TEST_TPU=1 to keep the
# real TPU for the (slow-compile) hardware tests.
if os.environ.get("X3TPU_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NB: do NOT enable the persistent compile cache here — serializing
    # the giant interpret-mode VM executables for the cache write is
    # itself an XLA:CPU crash site (segfault in executable.serialize /
    # the zstd writer, observed 2026-08-17), and the entries never land
    # anyway.  The one giant compile that exceeds the process's
    # late-suite tolerance runs subprocess-isolated instead
    # (test_vm.py::test_vm_promoted_rows_gated_paths).

import pytest

# ---------------------------------------------------------------------------
# Quick tier: `pytest -m quick` (< 5 min) for the edit-test loop — the full
# suite (~20 min with the interpret-mode VM compiles) stays the merge gate
# (CI runs it).  Membership: the format-critical fast modules plus one VM
# interpret case covering the kernel end to end.
# ---------------------------------------------------------------------------

QUICK_MODULES = {"test_spec", "test_ops_ac", "test_host", "test_cli",
                 "test_codec_jax"}
QUICK_TESTS = {"test_vm_encoder_matches_spec"}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast tier (< 5 min) for the edit-test loop"
    )


# XLA:CPU's JIT has a bounded LLVM section-memory arena per process
# (CLAUDE.md): after a few hundred distinct compiles, the NEXT big compile
# segfaults regardless of free RAM (hit at ~80% of the full suite once the
# round-3 kernels widened the interpret-mode programs).  Dropping the jit
# caches releases the arena; do it every N tests.
_CLEAR_EVERY = 25
_test_counter = [0]


def pytest_runtest_teardown(item, nextitem):
    _test_counter[0] += 1
    if _test_counter[0] % _CLEAR_EVERY == 0:
        import jax

        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in QUICK_MODULES
                or item.name.split("[")[0] in QUICK_TESTS):
            item.add_marker(pytest.mark.quick)


GOLDEN = pathlib.Path(__file__).parent / "golden"
REFERENCE_SRC = pathlib.Path("/root/reference")
REF_BIN = pathlib.Path("/tmp/x3ref-test/x3")

# Golden fixture parameter sets: name -> CLI args of the reference binary.
PARAMSETS = {
    "t15_w8": dict(max_match_count=15, window=8 * 1024),
    "t4_w1": dict(max_match_count=4, window=1024),
    "t2_w1_x": dict(max_match_count=2, window=1024, nl_remap=True),
    "t8_w2_m0": dict(max_match_count=8, window=2 * 1024, magic_factor1=0),
}


def golden_cases():
    """(input_name, paramset_name) pairs for which a golden .x3 exists."""
    cases = []
    for x3 in sorted(GOLDEN.glob("*.x3")):
        name, pname = x3.name[: -len(".x3")].rsplit(".", 1)
        cases.append((name, pname))
    return cases


@pytest.fixture(scope="session")
def ref_binary():
    """Build the reference binary from /root/reference at test time (never
    vendored into the repo); skip reference cross-tests if no toolchain."""
    if REF_BIN.exists():
        return REF_BIN
    builddir = REF_BIN.parent
    builddir.mkdir(parents=True, exist_ok=True)
    for f in REFERENCE_SRC.glob("*.[ch]"):
        (builddir / f.name).write_bytes(f.read_bytes())
    (builddir / "Makefile").write_bytes((REFERENCE_SRC / "Makefile").read_bytes())
    try:
        subprocess.run(
            ["make", "BUILD=release", "-j4"],
            cwd=builddir,
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference binary: {e}")
    return REF_BIN
