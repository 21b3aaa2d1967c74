"""Packaging surface: pyproject console scripts and wheel data files.

The reference is a flat script collection run as ``python main_*.py``
(reference README.md:64); a framework a user can *switch to* must install.
These tests pin the pyproject metadata without invoking pip: every declared
console script resolves to an importable callable, the version is single-
sourced from the package, and the native sources (compiled on first use by
ctypes loaders) are declared as package data so they ship in the wheel.
"""

import importlib
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    if sys.version_info >= (3, 11):
        import tomllib
    else:  # pragma: no cover
        tomllib = pytest.importorskip("tomli")
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    # every CLI the docs mention is exposed
    for name in ("synergy-pretrain", "synergy-mmr", "synergy-serve",
                 "synergy-port", "synergy-export"):
        assert name in scripts, name
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        func = getattr(mod, func_name)
        assert callable(func), f"{name} -> {target} is not callable"
        # CLI mains take argv=None so they are testable without sys.argv
        assert func.__code__.co_varnames[:1] == ("argv",), target


def test_cli_shims_discard_rich_returns(monkeypatch):
    """The module mains return TrainStates/metric dicts for programmatic use;
    the generated script wrapper runs sys.exit(main()), which would print
    that object and exit non-zero after a SUCCESSFUL run (found by driving
    the installed wheel's synergy-pretrain). The shims must swallow it."""
    from synergy_tpu import cli
    from synergy_tpu.train import pretrain

    seen = {}

    def fake_main(argv=None):
        seen["argv"] = argv
        return {"definitely": "not an exit status"}

    monkeypatch.setattr(pretrain, "main", fake_main)
    rc = cli.pretrain(["--tiny", "true"])
    assert rc == 0
    assert seen["argv"] == ["--tiny", "true"]


def test_cli_module_imports_lazily():
    """synergy_tpu.cli must not import the trainer/JAX stack at module
    import: `synergy-port --help` on a cold install should not pay the
    multi-second flax/optax import cost of modules it never runs."""
    import subprocess

    code = (
        "import sys\n"
        "import synergy_tpu.cli\n"
        "heavy = [m for m in ('synergy_tpu.train.pretrain', "
        "'synergy_tpu.serve', 'flax', 'optax') if m in sys.modules]\n"
        "assert not heavy, heavy\n"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr


def test_version_single_sourced(pyproject):
    import synergy_tpu

    assert "version" not in pyproject["project"]
    attr = pyproject["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "synergy_tpu.__version__"
    assert isinstance(synergy_tpu.__version__, str)
    assert synergy_tpu.__version__.count(".") >= 1


def test_native_sources_are_package_data(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in data["synergy_tpu.data.tokenizer"]
    assert "*.h" in data["synergy_tpu.data.tokenizer"]
    assert "*.cpp" in data["synergy_tpu.runtime"]
    # the files the globs must catch actually exist
    for rel in ("synergy_tpu/data/tokenizer/bpe.cpp",
                "synergy_tpu/data/tokenizer/unicode_ranges.h",
                "synergy_tpu/runtime/audio_frontend.cpp"):
        assert os.path.exists(os.path.join(ROOT, rel)), rel
