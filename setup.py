"""Package setup for speechT-TPU.

Builds the native C++ runtime (FLAC decoder / resampler / edit distance /
beam search) as part of installation; at runtime the library is also
rebuilt automatically whenever the C++ sources are newer than the cached
.so (speecht_tpu/native/__init__.py).
"""

from setuptools import find_packages, setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        try:
            from speecht_tpu import native

            native.build()
        except Exception as e:  # native build is retried lazily at runtime
            print(f"warning: deferred native build ({e})")


setup(
    name="speecht-tpu",
    version="0.1.0",
    description="TPU-native (JAX/XLA/Pallas) Wav2Letter CTC speech recognition framework",
    packages=find_packages(include=["speecht_tpu", "speecht_tpu.*"]),
    package_data={"speecht_tpu.native": ["*.cpp", "*.h"]},
    scripts=["speecht-cli"],
    python_requires=">=3.10",
    install_requires=["numpy", "jax", "flax", "optax", "orbax-checkpoint"],
    cmdclass={"build_py": BuildWithNative},
)
