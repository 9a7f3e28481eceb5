from .shapes_gen import ShapeGenConfig, SyntheticShapeDataGenerator
from .datasets import ShapeDataset, TestDataset, BatchIterator

__all__ = ["ShapeGenConfig", "SyntheticShapeDataGenerator",
           "ShapeDataset", "TestDataset", "BatchIterator"]
