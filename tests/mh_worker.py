"""Worker process for the multi-host proof test.

Usage: python tests/mh_worker.py <process_id> <num_processes> <port> <outdir>

Forces the CPU platform with 4 virtual devices, joins the gloo-backed
jax.distributed rendezvous through the PRODUCTION entry point
(excel_tpu.parallel.distributed.initialize), runs the shared workload, and
writes its results + an `is_primary`-gated checkpoint marker to <outdir>.
"""
import os
import sys

proc_id, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from excel_tpu.parallel.distributed import initialize, is_primary  # noqa: E402

active = initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=proc_id)
assert active, "initialize() must report distributed mode"
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402

from mh_common import run_eval_workload, run_workload  # noqa: E402

results = run_workload()
if len(sys.argv) > 6:
    results.update(run_eval_workload(sys.argv[5], sys.argv[6]))

# rank-0 checkpoint gating (the reference's `if args.local_rank == 0`,
# scripts/train_voc.py:251)
assert is_primary() == (proc_id == 0)
if is_primary():
    with open(os.path.join(outdir, "ckpt.flag"), "w") as f:
        f.write("primary")

np.savez(os.path.join(outdir, f"proc{proc_id}.npz"), **results)
print(f"proc {proc_id} done", flush=True)
