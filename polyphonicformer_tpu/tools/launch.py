"""SPMD job launcher — the reference's ``tools/dist_train.sh`` (torchrun +
NCCL, dist_train.sh:5-21) replaced with jax.distributed process wiring.

Two modes:

* **TPU pod (production)**: run the SAME command on every host of the
  slice (gcloud `--worker=all`); pass ``--coordinator auto`` so each
  process autodetects its rank from the TPU metadata::

      python -m polyphonicformer_tpu.tools.launch --coordinator auto -- \
          polyphonicformer_tpu.tools.train --preset video_r50_1x ...

* **Local simulation (tests / CPU)**: spawn N processes on this machine,
  each seeing K virtual CPU devices, coordinated over localhost — an
  (N*K)-device mesh without TPU hardware::

      python -m polyphonicformer_tpu.tools.launch --nproc 2 \
          --devices-per-proc 4 --sim-cpu -- \
          polyphonicformer_tpu.tools.dist_check

The launched module should call ``parallel.mesh.init_distributed()``
(reads COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID from the env this
launcher exports) before any other JAX use.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=1,
                    help="processes to spawn locally")
    ap.add_argument("--port", type=int, default=29500)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0, or 'auto' on a TPU pod; "
                    "default localhost:--port when spawning locally")
    ap.add_argument("--sim-cpu", action="store_true",
                    help="give each process virtual CPU devices "
                    "(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count)")
    ap.add_argument("--devices-per-proc", type=int, default=1,
                    help="virtual CPU devices per process with --sim-cpu")
    ap.add_argument("module", help="python module to run (python -m ...)")
    ap.add_argument("args", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    if args.coordinator == "auto":
        # TPU pod: exec in place, one process per host, jax autodetects
        env = dict(os.environ, COORDINATOR_ADDRESS="auto")
        os.execvpe(sys.executable,
                   [sys.executable, "-m", args.module, *args.args], env)

    coordinator = args.coordinator or f"localhost:{args.port}"
    procs = []
    for pid in range(args.nproc):
        env = dict(os.environ,
                   COORDINATOR_ADDRESS=coordinator,
                   NUM_PROCESSES=str(args.nproc),
                   PROCESS_ID=str(pid))
        if args.sim_cpu:
            env["JAX_PLATFORMS"] = "cpu"
            # strip only the TPU-relay site hook; keep other PYTHONPATH
            # entries child modules may need, with cwd prepended
            kept = [p for p in env.get("PYTHONPATH", "").split(":")
                    if p and ".axon_site" not in p and p != os.getcwd()]
            env["PYTHONPATH"] = ":".join([os.getcwd()] + kept)
            # drop any inherited device-count token (whole token — XLA
            # rejects duplicates/unknown flags fatally) before adding ours
            flags = [t for t in env.get("XLA_FLAGS", "").split()
                     if "--xla_force_host_platform_device_count" not in t]
            flags.append("--xla_force_host_platform_device_count="
                         f"{args.devices_per_proc}")
            env["XLA_FLAGS"] = " ".join(flags)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", args.module, *args.args], env=env))
    rc = 0
    for p in procs:
        rc = rc or p.wait()
    sys.exit(rc)


if __name__ == "__main__":
    main()
