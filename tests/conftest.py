import os
import sys

# The container bakes an axon sitecustomize (PYTHONPATH=/root/.axon_site)
# that registers a remote-compile PJRT hook; with it active, even trivial
# CPU host readbacks stall for minutes.  Tests run on the simulated 8-device
# CPU mesh, so re-exec once with the hook stripped before jax initializes.
if ".axon_site" in os.environ.get("PYTHONPATH", ""):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

# Tests run on a simulated 8-device CPU mesh — the "fake backend" for
# multi-chip logic the reference never had (SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: the vmapped Hungarian / full-model programs
# are slow to compile on CPU; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
