"""Realistic test-set generation CLI (reference test_data_generator.py:166-176
entry). source='coco' reproduces the reference's MS-COCO + Painting pipeline
(needs pycocotools + datasets); the default 'synthetic' source is a
self-contained procedural fallback with the same artifact schema."""

import sys

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator

if __name__ == "__main__":
    BIG = "--big" in sys.argv
    source = "coco" if "--coco" in sys.argv else "synthetic"
    argv = [a for a in sys.argv[1:] if a not in ("--big", "--coco")]
    args = get_args("data_gen_test", argv=argv)
    if BIG:
        args.data_path = args.data_path.replace("data_test", "data_test_big")
    generator = SyntheticRealisticDataGenerator(args, big=BIG, source=source)
    generator.generate_synthetic_data()
