"""Packaging contract: `pip install` of this repo produces a working
installed copy — package data (vocab metadata), the native kern-tools
library (built by setup.py's build hook), the console entry points, and
an out-of-tree compile-cache default. The reference ships no package at
all (research repo); a framework must be installable."""

import os
import subprocess
import sys

from conftest import REPO_ROOT


def _run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=kw.pop("timeout", 300), **kw)


def test_pip_install_target(tmp_path):
    target = str(tmp_path / "site")
    r = _run([sys.executable, "-m", "pip", "install", "--no-deps",
              "--no-build-isolation", "--quiet", "--target", target,
              REPO_ROOT])
    assert r.returncode == 0, r.stdout + r.stderr

    # Installed artifacts: package data + native lib + console scripts.
    pkg = os.path.join(target, "piano_a2s_tpu")
    assert os.path.exists(os.path.join(pkg, "data", "metadata",
                                       "time_signature_list.json"))
    assert os.path.exists(os.path.join(pkg, "symbolic",
                                       "libkern_tools.so"))
    for script in ("piano-a2s-pretrain", "piano-a2s-transcribe",
                   "piano-a2s-prepare-data", "piano-a2s-serve"):
        assert os.path.exists(os.path.join(target, "bin", script)), script

    # The installed copy must work WITHOUT the repo checkout: run from a
    # neutral cwd with only the install target on the path (the repo dir
    # would otherwise shadow the installed package).
    check = (
        "import sys; sys.path.insert(0, %r); "
        "import piano_a2s_tpu.symbolic.native as n; "
        "assert n._load_lib() is not None, 'native lib'; "
        "from piano_a2s_tpu.data.datasets import load_time_signatures; "
        "assert load_time_signatures()[0] == '4/4'; "
        "from piano_a2s_tpu.utils.cache import _DEFAULT; "
        "assert %r not in _DEFAULT, _DEFAULT; "
        "from piano_a2s_tpu.cli.pretrain import main; "
        "from piano_a2s_tpu.symbolic import LabelsMultiple; "
        "assert len(LabelsMultiple(extended=True).labels_map) == 173; "
        "print('ok')" % (target, REPO_ROOT))
    r = _run([sys.executable, "-c", check], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok" in r.stdout


def test_console_script_help(tmp_path):
    """The generated console script parses args (exits 0 on --help)."""
    target = str(tmp_path / "site")
    r = _run([sys.executable, "-m", "pip", "install", "--no-deps",
              "--no-build-isolation", "--quiet", "--target", target,
              REPO_ROOT])
    assert r.returncode == 0, r.stdout + r.stderr
    env = dict(os.environ, PYTHONPATH=target)
    r = _run([sys.executable, os.path.join(target, "bin",
                                           "piano-a2s-transcribe"),
              "--help"], env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "--checkpoint" in r.stdout
