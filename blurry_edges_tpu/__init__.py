"""blurry-edges-tpu: TPU-native (JAX/XLA/Pallas/pjit) framework for photon-limited
depth estimation from defocused boundaries.

A ground-up rebuild of the capabilities of guo-research-group/Blurry-Edges
(CVPR 2025, arXiv 2503.23606) designed TPU-first: functional math core, Flax
models, fused Pallas kernels for the wedge-render/ridge-solve hot path, and
pjit/shard_map parallelism over device meshes.

Subpackages
-----------
- ``config``   : dataclass configs + argparse CLI parity (reference utils/args.py)
- ``ops``      : wedge rasterizer, ridge color solver, DfD solver, optics,
                 patchify (unfold/fold), Sobel (reference utils/postprocessing_loss.py,
                 utils/depth_etas.py, utils/data_generator.py)
- ``models``   : LocalStage CNN, GlobalStage transformer, depth-completion UNet
                 (reference models/)
- ``data``     : on-device synthetic shape generator, realistic test generator,
                 npy-backed dataset loaders (reference train_val_data_generator.py,
                 test_data_generator.py, data/dataset.py)
- ``train``    : local/global/densify training harnesses, schedules, checkpointing
                 (reference local_training.py, global_training.py)
- ``eval``     : inference pipelines (147x147 and block-tiled big), metrics,
                 visualizer (reference blurry_edges_test.py, blurry_edges_test_big.py)
- ``parallel`` : mesh + sharding helpers
"""

__version__ = "0.1.0"
