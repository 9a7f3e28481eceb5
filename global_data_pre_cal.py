"""Global-stage input pre-calculation CLI (reference
global_data_pre_cal.py:52-70 entry)."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.global_precal import run_global_precal

if __name__ == "__main__":
    run_global_precal(get_args("global_pre"))
