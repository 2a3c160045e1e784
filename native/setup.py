"""Build the native host data-path extension:

    cd native && python setup.py build_ext --inplace

The package loads it opportunistically (multimodalstudio_tpu/data/native.py);
everything falls back to numpy when the extension isn't built.
"""

from setuptools import Extension, setup

setup(
    name="mms-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "_mms_native",
            sources=["mms_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
)
