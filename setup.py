"""Build hook: compile the native C++ planner alongside the Python package.

``pip install .`` builds ``tpu_qsim/native/libqsimnative.so`` via the
CPython-free ctypes route (no pybind11 dependency); the library is optional
at runtime — every native entry point has a pure-Python fallback.
"""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(
                ["make", "-C", "tpu_qsim/native"], check=True, timeout=300
            )
        except Exception as exc:  # native lib is optional
            print(f"warning: native planner build skipped: {exc}",
                  file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
