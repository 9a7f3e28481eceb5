"""Console entry points (pyproject [project.scripts]).

Each function wraps one of the reference's CLI entry scripts (the root-level
shims keep the reference's file names: blurry_edges_test.py,
local_training.py, ... — reference repo root) so an installed package exposes
the seven operating modes without a repo checkout:

    blurry-edges-eval --densify pp          # blurry_edges_test.py
    blurry-edges-eval-big                   # blurry_edges_test_big.py
    blurry-edges-local-train                # local_training.py
    blurry-edges-global-precal              # global_data_pre_cal.py
    blurry-edges-global-train               # global_training.py
    blurry-edges-densify-train              # depth_completion_training.py
    blurry-edges-gen-trainval               # train_val_data_generator.py
    blurry-edges-gen-test                   # test_data_generator.py

All argument handling lives in config.get_args (flag-for-flag with reference
utils/args.py); these wrappers only route argv and assemble the run objects,
exactly like the root shims.
"""

import sys
from typing import Optional


def _mesh_from(args):
    if getattr(args, "dp_devices", 0) and args.dp_devices > 1:
        from .parallel import make_mesh

        return make_mesh(args.dp_devices)
    return None


def eval_main(argv: Optional[list] = None) -> None:
    """147x147 evaluation with optional densification (--densify w|pp) and
    --profile tracing (reference blurry_edges_test.py:174-203)."""
    from .config import get_args
    from .eval.pipeline import run_eval
    from .eval.visualize import make_file_visualizer
    from .utils.weights import load_inference_modules

    argv = list(sys.argv[1:] if argv is None else argv)
    profile = "--profile" in argv
    argv = [a for a in argv if a != "--profile"]
    args = get_args("eval", argv=argv)
    modules = load_inference_modules(args, densify=args.densify)
    run_eval(args, modules, visualizer=make_file_visualizer(args),
             profile_dir=f"{args.log_path}/trace" if profile else None)


def eval_big_main(argv: Optional[list] = None) -> None:
    """587x587 block-tiled evaluation (reference blurry_edges_test_big.py)."""
    from .config import get_args
    from .eval.pipeline_big import run_eval_big
    from .eval.visualize import make_file_visualizer
    from .utils.weights import load_inference_modules

    args = get_args("eval", big=True,
                    argv=sys.argv[1:] if argv is None else argv)
    modules = load_inference_modules(args, big=True)
    run_eval_big(args, modules,
                 visualizer=make_file_visualizer(args, big=True))


def local_train_main(argv: Optional[list] = None) -> None:
    """Local-stage CNN training (reference local_training.py:68-122)."""
    from .config import get_args
    from .train.local import run_local_training

    args = get_args("local_train", argv=sys.argv[1:] if argv is None else argv)
    run_local_training(args, mesh=_mesh_from(args))


def global_precal_main(argv: Optional[list] = None) -> None:
    """Global-stage input pre-calculation (reference global_data_pre_cal.py)."""
    from .config import get_args
    from .train.global_precal import run_global_precal

    run_global_precal(get_args("global_pre",
                               argv=sys.argv[1:] if argv is None else argv))


def global_train_main(argv: Optional[list] = None) -> None:
    """Global-stage transformer training incl. --w_variant
    (reference global_training.py:173-225)."""
    from .config import get_args
    from .train.global_ import run_global_training

    args = get_args("global_train", argv=sys.argv[1:] if argv is None else argv)
    run_global_training(args, mesh=_mesh_from(args))


def densify_train_main(argv: Optional[list] = None) -> None:
    """Depth-completion U-Net training; --pipeline sources sparse maps from
    the full three-stage inference (reference depth_completion_training.py)."""
    from .config import get_args
    from .train.densify import run_densify_training

    argv = list(sys.argv[1:] if argv is None else argv)
    source = "pipeline" if "--pipeline" in argv else "simulated"
    argv = [a for a in argv if a != "--pipeline"]
    args = get_args("local_train", argv=argv)
    args.data_path = args.data_path.replace("/patches", "")
    modules = None
    max_samples = None
    if source == "pipeline":
        from .utils.weights import load_inference_modules

        modules = load_inference_modules(args)
        max_samples = (1500, 300)
    run_densify_training(args, source=source, modules=modules,
                         max_samples=max_samples)


def gen_trainval_main(argv: Optional[list] = None) -> None:
    """Basic-shape train/val set generation + noise + patch crops
    (reference train_val_data_generator.py)."""
    from .config import get_args
    from .data.shapes_gen import SyntheticShapeDataGenerator
    from .utils.seeding import set_seed

    args = get_args("data_gen_train_val",
                    argv=sys.argv[1:] if argv is None else argv)
    set_seed(1869)
    generator = SyntheticShapeDataGenerator(args)
    for train in (True, False):
        part = "training" if train else "validation"
        print(f"Generating synthetic data for {part} set...")
        generator.generate_synthetic_data(train=train)
        print("- Adding noise...")
        generator.add_noise(train=train)
        print("- Cropping to patches...")
        generator.crop_patch(train=train)


def gen_test_main(argv: Optional[list] = None) -> None:
    """Realistic layered-defocus test set; --big for 587x587, --coco for the
    photographic-texture branch (reference test_data_generator.py)."""
    from .config import get_args
    from .data.realistic_gen import SyntheticRealisticDataGenerator

    argv = list(sys.argv[1:] if argv is None else argv)
    big = "--big" in argv
    source = "coco" if "--coco" in argv else "synthetic"
    argv = [a for a in argv if a not in ("--big", "--coco")]
    args = get_args("data_gen_test", argv=argv)
    if big:
        args.data_path = args.data_path.replace("data_test", "data_test_big")
    SyntheticRealisticDataGenerator(args, big=big,
                                    source=source).generate_synthetic_data()
