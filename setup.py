"""pip front-end that also builds the native runtime library.

The analog of the reference's pip->make bridge (``setup.py:26-71`` +
``kernel/Makefile``): the Python build delegates the native component to
``make`` (here a single C++ shared library, no CUDA/TF flag discovery
needed).  The package remains fully functional without the native library
(pure-Python fallbacks); the build failure is therefore non-fatal.
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        try:
            subprocess.run(
                ["make", "-s", "-C", "tf_flash_attention_tpu/csrc"],
                check=True, timeout=300,
            )
        except Exception as exc:  # non-fatal: Python fallbacks exist
            print(f"warning: native library build skipped ({exc})")
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
