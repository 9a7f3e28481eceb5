"""Local-stage training CLI (reference local_training.py:68-122 entry).

--dp_devices N shards the batch over an N-device 'data' mesh (SPMD data
parallelism; params replicated, gradient psum over ICI)."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.local import run_local_training

if __name__ == "__main__":
    args = get_args("local_train")
    mesh = None
    if getattr(args, "dp_devices", 0) and args.dp_devices > 1:
        from blurry_edges_tpu.parallel import make_mesh
        mesh = make_mesh(args.dp_devices)
    run_local_training(args, mesh=mesh)
