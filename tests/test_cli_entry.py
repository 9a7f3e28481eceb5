"""Packaging wiring: every console script in pyproject resolves to a callable
in blurry_edges_tpu.cli, and the argv-flag routing (--profile / --pipeline /
--big / --coco strippers) matches the root shims' behavior."""

import importlib
import pathlib
import tomllib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _scripts():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]["scripts"]


def test_console_scripts_resolve():
    scripts = _scripts()
    assert len(scripts) == 8  # the seven modes + the big-image eval
    for name, target in scripts.items():
        mod, attr = target.split(":")
        fn = getattr(importlib.import_module(mod), attr)
        assert callable(fn), name


def test_gen_test_flag_routing(monkeypatch, tmp_path):
    """--big reroutes data_path and --coco selects the photographic branch,
    exactly like the root shim (test_data_generator.py)."""
    from blurry_edges_tpu import cli

    seen = {}

    class FakeGen:
        def __init__(self, args, big=False, source="synthetic", **kw):
            seen.update(big=big, source=source, data_path=args.data_path)

        def generate_synthetic_data(self):
            seen["ran"] = True

    monkeypatch.setattr("blurry_edges_tpu.data.realistic_gen."
                        "SyntheticRealisticDataGenerator", FakeGen)
    cli.gen_test_main(["--big", "--coco", "--data_path",
                       str(tmp_path / "data_test")])
    assert seen == {"big": True, "source": "coco",
                    "data_path": str(tmp_path / "data_test_big"), "ran": True}


def test_eval_profile_flag_stripped(monkeypatch, tmp_path):
    """--profile is a shim-level flag: stripped from argv, routed as
    profile_dir (config.get_args would reject it)."""
    from blurry_edges_tpu import cli

    seen = {}
    monkeypatch.setattr("blurry_edges_tpu.utils.weights.load_inference_modules",
                        lambda args, densify=None: "MODS")
    monkeypatch.setattr("blurry_edges_tpu.eval.visualize.make_file_visualizer",
                        lambda args: None)

    def fake_run_eval(args, modules, visualizer=None, profile_dir=None):
        seen.update(profile_dir=profile_dir, densify=args.densify,
                    modules=modules)

    monkeypatch.setattr("blurry_edges_tpu.eval.pipeline.run_eval", fake_run_eval)
    cli.eval_main(["--profile", "--densify", "pp",
                   "--log_path", str(tmp_path)])
    assert seen == {"profile_dir": f"{tmp_path}/trace", "densify": "pp",
                    "modules": "MODS"}
