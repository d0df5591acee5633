"""Test configuration.

Jobs:
1. Re-exec pytest WITHOUT the axon TPU sitecustomize on PYTHONPATH.  The
   sitecustomize registers a tunneled TPU PJRT plugin whose remote-compile
   hook adds ~1s+ latency to every XLA compilation — including CPU-target
   compiles — which makes an eager-mode test suite orders of magnitude
   slower.  Tests are CPU-only by design, so we strip it.  The re-exec
   happens inside `pytest_configure` AFTER suspending pytest's fd-level
   capture, so output survives whether stdout is a tty, a pipe, or a
   redirected file.
2. Force CPU with 8 virtual devices so multi-chip sharding paths are
   exercised without TPU hardware, and enable x64 to match the reference's
   double-precision math (typedefs_base.hpp:129).
3. Persistent XLA compilation cache: the suite's cost is dominated by
   recompiles of the same kernels across processes/runs; cache them on
   disk.
4. Fast/slow lanes: tests marked `slow` (multi-agent end-to-end scenarios,
   socket E2E, the sharded-GBA exactness compare, fake-EuRoC server runs)
   are skipped by default; run them with `--runslow` or COVINS_RUN_SLOW=1.
   The default lane is the per-commit correctness gate: every kernel and
   subsystem unit-tested, one loop-closure and one merge integration kept.
   Measured ~5 min warm / ~10 min cold on a 2-vCPU container (XLA compile
   dominates; scales down with cores and the persistent compile cache).
   The slow lane adds the full scenario matrix (~25 min cold on 2 vCPU).
"""

import os
import sys

import pytest

_AXON_SITE = "/root/.axon_site"


def _needs_reexec() -> bool:
    return (
        os.environ.get("COVINS_TPU_TEST_REEXEC") != "1"
        and _AXON_SITE in os.environ.get("PYTHONPATH", "")
    )


if not _needs_reexec():
    # environment must be fixed before jax is imported by any test module
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache (shared across test processes and runs)
    cache_dir = os.environ.get(
        "COVINS_TPU_COMPILE_CACHE", "/tmp/covins_tpu_xla_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the knobs


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-agent end-to-end scenarios)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long multi-agent end-to-end scenario (excluded "
        "from the default lane; enable with --runslow or COVINS_RUN_SLOW=1)"
    )
    if _needs_reexec():
        # Suspend pytest's fd-level capture so fds 1/2 are the caller's
        # original streams again (tty, pipe, or redirected file), then
        # replace the process.  Never hunt for fds by heuristics — that
        # destroyed output when stdout was a regular file.
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            try:
                capman.stop_global_capturing()
            except Exception:
                pass
        sys.stdout.flush()
        sys.stderr.flush()
        env = dict(os.environ)
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":")
            if p and p != _AXON_SITE
        )
        env["COVINS_TPU_TEST_REEXEC"] = "1"
        os.execve(
            sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
        )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("COVINS_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow lane: pass --runslow or set COVINS_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
