"""Test configuration: force a virtual 8-device CPU mesh with float64.

The image's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) imports jax at
interpreter startup and registers the axon TPU PJRT plugin, which (a) freezes
XLA_FLAGS before we can force host devices and (b) routes even CPU compiles
through the remote-compile relay (minutes of stall per process). Tests are
pure-correctness and must run on a local 8-device CPU mesh, so if the axon
hook is active we re-exec pytest once with a scrubbed environment. bench.py
and the driver's compile checks keep the normal (TPU) environment.
"""
import os
import sys

_MARK = "_ALTRO_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_MARK):
        return False
    pp = os.environ.get("PYTHONPATH", "")
    return ".axon_site" in pp or os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")


if _needs_reexec():
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
