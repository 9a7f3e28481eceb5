"""Global-stage training CLI (reference global_training.py:173-225 entry).

--dp_devices N shards the batch over an N-device 'data' mesh (SPMD data
parallelism; params replicated, gradient psum over ICI)."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.global_ import run_global_training

if __name__ == "__main__":
    args = get_args("global_train")
    mesh = None
    if getattr(args, "dp_devices", 0) and args.dp_devices > 1:
        from blurry_edges_tpu.parallel import make_mesh
        mesh = make_mesh(args.dp_devices)
    # step-granular snapshots (--snapshot_steps, default 50): at production
    # scale an epoch is many minutes on one chip and the round-2 runtime
    # killed every marathon mid-epoch, so epoch-granularity is not enough
    run_global_training(args, mesh=mesh)
