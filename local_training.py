"""Local-stage training CLI (reference local_training.py:68-122 entry)."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.local import run_local_training

if __name__ == "__main__":
    run_local_training(get_args("local_train"))
