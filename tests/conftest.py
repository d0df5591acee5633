"""Test configuration.

Two jobs:
1. Re-exec pytest WITHOUT the axon TPU sitecustomize on PYTHONPATH.  The
   sitecustomize registers a tunneled TPU PJRT plugin whose remote-compile
   hook adds ~1s+ latency to every XLA compilation — including CPU-target
   compiles — which makes an eager-mode test suite orders of magnitude
   slower.  Tests are CPU-only by design, so we strip it.
2. Force CPU with 8 virtual devices so multi-chip sharding paths are
   exercised without TPU hardware, and enable x64 to match the reference's
   double-precision math (typedefs_base.hpp:129).
"""

import os
import stat
import sys

_AXON_SITE = "/root/.axon_site"


def _is_stream(fd):
    try:
        st = os.fstat(fd)
    except OSError:
        return False
    return (
        stat.S_ISFIFO(st.st_mode)
        or stat.S_ISCHR(st.st_mode)
        or stat.S_ISSOCK(st.st_mode)
    )


def _restore_real_stdio():
    """If pytest's fd-level capture already replaced fds 1/2 with tmpfiles,
    point them back at the original pipes/tty (pytest keeps dup'd copies of
    the originals open) so the re-exec'd process stays visible."""
    if _is_stream(1):
        return
    try:
        st0 = os.fstat(0)
    except OSError:
        st0 = None
    cands = []
    for fd in range(3, 64):
        if not _is_stream(fd):
            continue
        try:
            st = os.fstat(fd)
        except OSError:
            continue
        if st0 is not None and (st.st_ino, st.st_dev) == (st0.st_ino, st0.st_dev):
            continue  # saved copy of stdin
        cands.append(fd)
    if cands:
        os.dup2(cands[0], 1)
        os.dup2(cands[1] if len(cands) > 1 else cands[0], 2)


if (
    os.environ.get("COVINS_TPU_TEST_REEXEC") != "1"
    and _AXON_SITE in os.environ.get("PYTHONPATH", "")
):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if p and p != _AXON_SITE
    )
    env["COVINS_TPU_TEST_REEXEC"] = "1"
    _restore_real_stdio()
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
