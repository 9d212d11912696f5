"""Build the native data-plane extension:

    cd native && python setup.py build_ext --inplace

The resulting _fastio*.so is picked up by longterm360fov_tpu.native
(which falls back to pure numpy when the extension is absent).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="fastio",
    ext_modules=[
        Extension(
            "_fastio",
            sources=["fastio.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-Wall"],
        )
    ],
)
