"""Build hook: compile the native kern tools into the package.

The library is optional — piano_a2s_tpu.symbolic.native falls back to the
pure-Python twins (fuzz-tested equivalent) when it is absent — so a
missing compiler degrades gracefully instead of failing the install.
All other metadata lives in pyproject.toml.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))


class build_py_with_native(build_py):
    def run(self):
        src = os.path.join(HERE, "native", "kern_tools.cpp")
        out = os.path.join(HERE, "piano_a2s_tpu", "symbolic",
                           "libkern_tools.so")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     src, "-o", out], check=True, timeout=600)
                print(f"built native kern tools: {out}")
            except Exception as exc:  # noqa: BLE001 — degrade, don't fail
                print("warning: native kern-tools build skipped "
                      f"({exc}); the pure-Python twins will be used")
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
