from .seeding import set_seed
from .io import create_directory, show_curve, TrainLogger

__all__ = ["set_seed", "create_directory", "show_curve", "TrainLogger"]
