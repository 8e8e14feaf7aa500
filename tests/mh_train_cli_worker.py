"""Worker for the multi-host TRAIN CLI smoke.

Usage: python mh_train_cli_worker.py <proc_id> <nproc> <port> <workdir>

Configures a 4-virtual-device CPU backend with gloo collectives, then runs
the PRODUCTION train driver (`excel_tpu.cli.train.main`) end to end: its
own `initialize()` picks up COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
from the environment, the loader shards the global permutation per process,
the step runs data-parallel over all 8 devices, and checkpoint/val writes
are primary-gated.
"""
import os
import sys

proc_id, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["NUM_PROCESSES"] = str(nproc)
os.environ["PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from excel_tpu.parallel.distributed import initialize  # noqa: E402

# establish the gloo context NOW, while both processes sit at the same
# early point — the first real collective otherwise fires after this
# process's train-step compile, and on a 1-core host the cross-process
# compile skew can exceed gloo's 30 s context-init deadline
assert initialize()
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

_mesh = Mesh(np.asarray(jax.devices()), ("d",))
_arr = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, P("d")),
    np.ones(jax.local_device_count(), np.float32))
jax.jit(lambda x: x.sum(),
        out_shardings=NamedSharding(_mesh, P()))(_arr).block_until_ready()

from excel_tpu.cli.train import main  # noqa: E402

# NOTE: no --no-eval — in-training validation must run too: its final hist
# reduction is a cross-process collective, and primary-gating it deadlocked
# an earlier revision (validation now runs on every process's shard)
main(["--tiny", "--synthetic", "8", "--random-init", "--work-dir", workdir,
      "--max-iters", "4", "--eval-iters", "4", "--log-iters", "2",
      "--batch-size", "4", "--num-workers", "2"])
print(f"train cli proc {proc_id} done", flush=True)
