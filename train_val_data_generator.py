"""Basic-shape train/val data generation CLI (reference
train_val_data_generator.py:277-297 entry; same flags, same artifacts, but the
synthesis runs on the TPU)."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.data.shapes_gen import SyntheticShapeDataGenerator
from blurry_edges_tpu.utils.seeding import set_seed

if __name__ == "__main__":
    args = get_args("data_gen_train_val")
    set_seed(1869)
    generator = SyntheticShapeDataGenerator(args)

    print("Generating synthetic data for training set...")
    generator.generate_synthetic_data(train=True)
    print("- Adding noise...")
    generator.add_noise(train=True)
    print("- Cropping to patches...")
    generator.crop_patch(train=True)

    print("Generating synthetic data for validation set...")
    generator.generate_synthetic_data(train=False)
    print("- Adding noise...")
    generator.add_noise(train=False)
    print("- Cropping to patches...")
    generator.crop_patch(train=False)
