"""Pytest bootstrap: force a hermetic 8-device CPU JAX backend.

The sandbox pins JAX to the 'axon' TPU platform via a sitecustomize hook on
PYTHONPATH, and the single real TPU chip is granted to one process at a time.
Running the unit suite there would (a) serialize against any other JAX
process and (b) pay 20-40s XLA compiles per kernel.  Instead we re-exec
pytest once with a scrubbed environment: pure CPU backend with 8 virtual
devices, which is the framework's hermetic stand-in for a TPU slice (the
role DEBUG_PROOF + the in-memory DB play in the reference test suite —
reference: src/settlement/worker.rs:49-96, src/db/lfs/mem.rs).

Real-TPU coverage comes from bench.py and __graft_entry__.py, which the
driver runs on the actual chip.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SENTINEL = "EZT_PYTEST_CPU_REEXEC"

if os.environ.get(_SENTINEL) != "1":
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("EZT_TEST_XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # Drop the sitecustomize that force-registers the axon TPU plugin.
    env["PYTHONPATH"] = ""
    # Persistent compilation cache: EC/shard_map graphs are expensive for
    # XLA CPU; repeated suite runs hit the cache instead.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    # subprocess (not execve): the sandbox wrapper loses exec'd-process output.
    rc = subprocess.call(
        [sys.executable, "-m", "pytest"] + sys.argv[1:], env=env
    )
    os._exit(rc)

# Past this point we are in the re-exec'd clean-CPU process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
