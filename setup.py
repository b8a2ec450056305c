"""Build script: compiles the native host core as a C extension.

The package is fully functional without it (pure-Python trie fallback);
the extension provides reference-C-speed trie mutation and the sequential
scan fast paths.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "pyahocorasick_tpu._native._ahocore",
            sources=["pyahocorasick_tpu/_native/module.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ]
)
