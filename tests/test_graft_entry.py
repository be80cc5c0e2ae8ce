"""Unit tests for the driver-entry helpers in __graft_entry__.py.

The dryrun re-exec path is load-bearing for the driver's multichip check
(MULTICHIP_r*.json): it must produce a child environment that (a) forces
the CPU backend, (b) strips the axon TPU plugin from PYTHONPATH so the
child cannot block on a dead tunnel, and (c) requests exactly n virtual
host devices. The full re-exec is exercised end-to-end by the verify
drive; these tests pin the env contract cheaply.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from __graft_entry__ import _dryrun_child_env


def test_child_env_forces_cpu_and_device_count():
    env = _dryrun_child_env({"XLA_FLAGS": "--foo=1"}, 8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["JAX_PLATFORM_NAME"] == "cpu"
    assert env["_GRAFT_DRYRUN_REEXEC"] == "1"
    # XLA_FLAGS must be DETERMINISTIC, not inherited: any extra flag
    # changes the compilation-cache key, so a pre-warmed cache would be
    # missed under the driver's (unknown) environment.
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"


def test_child_env_replaces_stale_device_count():
    env = _dryrun_child_env(
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"}, 16)
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=16"


def test_child_env_per_machine_cpu_cache():
    # Foreign-host AOT entries in the shared cache error on load and risk
    # SIGILL; the child must get a per-machine CPU namespace instead.
    env = _dryrun_child_env({"JAX_CACHE_DIR": "/root/.jax_cache"}, 8)
    assert env["JAX_CACHE_DIR"].startswith("/root/.jax_cache_cpu_")
    assert env["JAX_CACHE_DIR"] != "/root/.jax_cache"


def test_child_env_strips_axon_plugin_from_pythonpath():
    base = {"PYTHONPATH": os.pathsep.join(
        ["/root/.axon_site", "/some/other/path"])}
    env = _dryrun_child_env(base, 8)
    assert env["PYTHONPATH"] == "/some/other/path"

    env = _dryrun_child_env({"PYTHONPATH": "/root/.axon_site"}, 8)
    assert "PYTHONPATH" not in env

    env = _dryrun_child_env({}, 8)
    assert "PYTHONPATH" not in env
