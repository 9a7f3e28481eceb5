"""Load the reference implementation (PyTorch, CPU) as a numerical test oracle.

The reference repo at /root/reference is read-only and is loaded by file path
so its package names never collide with ours. Used only to assert numerical
parity; skipped automatically when unavailable.
"""

import importlib.util
import os
import types

REF_ROOT = "/root/reference"


def available() -> bool:
    if not os.path.isdir(REF_ROOT):
        return False
    try:
        import torch
        # cap torch's intra-op pool: a large OpenMP pool can deadlock against
        # XLA's CPU thread pool when both run in one test process
        torch.set_num_threads(4)
        return True
    except ImportError:
        return False


def load_module(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_top_level(relpath: str, name: str):
    """Load a reference top-level script that imports the reference's sibling
    packages (data/models/utils). Temporarily puts /root/reference first on
    sys.path and evicts the package names afterwards so nothing leaks into the
    test session."""
    import sys

    touched = [m for m in list(sys.modules)
               if m in ("data", "models", "utils") or m.startswith(("data.", "models.", "utils."))]
    saved = {m: sys.modules.pop(m) for m in touched}
    sys.path.insert(0, REF_ROOT)
    try:
        return load_module(relpath, name)
    finally:
        sys.path.remove(REF_ROOT)
        for m in [m for m in list(sys.modules)
                  if m in ("data", "models", "utils") or m.startswith(("data.", "models.", "utils."))]:
            del sys.modules[m]
        sys.modules.update(saved)


def make_args(**overrides) -> types.SimpleNamespace:
    """Minimal Namespace with the shared base flags (reference utils/args.py:6-15)."""
    base = dict(
        R=21,
        w=1.0,
        alpha_lambda=5e-3,
        batch_size=4,
        stride=2,
        img_size=[147, 147],
        big_img_size=[587, 587],
        mag=4.0,
        cam_params={"s": 0.1104, "rho_1": 10.0, "rho_2": 10.2,
                    "sigma_cam": 0.003, "pixel_pitch": 5.86e-6},
        Z_range=[0.75, 1.18],
        alpha=[180.0, 200.0],
        sigma=2.0,
        data_path="/tmp/unused",
    )
    base.update(overrides)
    return types.SimpleNamespace(**base)
