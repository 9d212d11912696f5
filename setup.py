"""Package build: wires the native C data-plane extension into the wheel.

``pip install -e .`` (or ``python setup.py build_ext --inplace``) compiles
``native/fastio.c`` into ``longterm360fov_tpu._fastio`` so the fast
parse/window paths run by default (SURVEY.md §3.1 host-side hot paths).
The pure-numpy fallback in ``longterm360fov_tpu.native`` keeps build-less
installs fully functional — the extension is declared optional so a
missing compiler degrades instead of failing the install.
"""

import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "longterm360fov_tpu._fastio",
            sources=["native/fastio.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-Wall"],
            optional=True,
        )
    ],
)
