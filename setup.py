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
        import shutil

        src = os.path.join(HERE, "native", "kern_tools.cpp")
        out = os.path.join(HERE, "piano_a2s_tpu", "symbolic",
                           "libkern_tools.so")
        if os.path.exists(src):
            built = False
            for cxx in ("g++", "c++", "clang++"):
                if not shutil.which(cxx):
                    continue
                try:
                    subprocess.run(
                        [cxx, "-O2", "-std=c++17", "-shared", "-fPIC",
                         src, "-o", out], check=True, timeout=600)
                    print(f"built native kern tools with {cxx}: {out}")
                    built = True
                    break
                except Exception as exc:  # noqa: BLE001
                    print(f"warning: {cxx} build failed ({exc})")
            if not built and os.path.exists(out):
                # Never package a possibly-stale .so from an earlier
                # build: the runtime rebuilds on demand or falls back to
                # the pure-Python twins, both of which match the sources.
                os.remove(out)
                print("warning: native kern-tools build unavailable; "
                      "removed stale libkern_tools.so — the pure-Python "
                      "twins will be used")
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
