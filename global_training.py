"""Global-stage training CLI (reference global_training.py:173-225 entry)."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.global_ import run_global_training

if __name__ == "__main__":
    run_global_training(get_args("global_train"))
