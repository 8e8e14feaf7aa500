"""Worker for the multi-host INFER CLI smoke.

Usage: python mh_infer_lam_worker.py <proc_id> <nproc> <port> <workdir>

Runs the PRODUCTION LAM-eval driver (`excel_tpu.cli.infer_lam.main`) under a
2-process gloo rendezvous: `shard_dataset` round-robins the images per
process (the reference's idiom, tools/infer_lam.py:166-167), each process
sweeps its shard data-parallel over its 4 virtual devices, and the final
hist is reduced ACROSS processes (`global_sum_host`) — the metric
all-reduce the reference forgot (its per-rank tables are never combined).
Writes this process's per-class IoU to procN_lam.npz for the test to
compare against a single-process run.
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

# establish the gloo context while both processes sit at the same early
# point (compile skew on a 1-core host can exceed the 30 s init deadline)
assert initialize()
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

_mesh = Mesh(np.asarray(jax.devices()), ("d",))
_arr = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, P("d")),
    np.ones(jax.local_device_count(), np.float32))
jax.jit(lambda x: x.sum(),
        out_shardings=NamedSharding(_mesh, P()))(_arr).block_until_ready()

from excel_tpu.cli.infer_lam import main  # noqa: E402

# --crf-tpu: the fused on-device CRF branch rides along — its hist is a
# second cross-process reduction, and the canvas-image batch goes through
# the local DP mesh sharding (r5, engine/evaluate.lam_crf_hist_step)
scores, crf_scores = main(["--tiny", "--synthetic", "6", "--random-init",
                           "--training-free", "--work-dir", workdir,
                           "--batch-size", "2", "--crf-tpu"])
iou = np.asarray([scores["iou"][k] for k in sorted(scores["iou"])])
crf_iou = np.asarray([crf_scores["iou"][k]
                      for k in sorted(crf_scores["iou"])])
np.savez(os.path.join(workdir, f"proc{proc_id}_lam.npz"),
         iou=iou, miou=scores["miou"],
         crf_iou=crf_iou, crf_miou=crf_scores["miou"])
print(f"infer_lam cli proc {proc_id} done", flush=True)
