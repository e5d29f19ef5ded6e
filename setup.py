"""Packaging for autodriver_pointcloud_preprocessor_tpu.

Console entry points mirror the reference's (reference setup.py:63-68
registers pointcloud_preprocessor + pointcloud_compressor) and add the
loader/concatenator commands the reference declared as stubs. The native
sidecars build via ``make -C autodriver_pointcloud_preprocessor_tpu/native``
(optional; numpy fallbacks are wire-identical).
"""
from setuptools import find_packages, setup

setup(
    name="autodriver_pointcloud_preprocessor_tpu",
    version="0.1.0",
    description=(
        "TPU-native LiDAR point-cloud preprocessing framework "
        "(JAX/XLA): crop, voxel, outlier removal, normals, RANSAC ground "
        "segmentation, multi-LiDAR concat, PCAP replay, compression"
    ),
    packages=find_packages(exclude=("tests",)),
    package_data={
        "autodriver_pointcloud_preprocessor_tpu.native": ["*.cc", "Makefile", "*.so"],
    },
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
    extras_require={
        "test": ["pytest", "scipy"],
        "viz": ["matplotlib"],
    },
    entry_points={
        "console_scripts": [
            "pointcloud_preprocessor = autodriver_pointcloud_preprocessor_tpu.cli:preprocessor_main",
            "pointcloud_compressor = autodriver_pointcloud_preprocessor_tpu.cli:compressor_main",
            "pointcloud_loader = autodriver_pointcloud_preprocessor_tpu.cli:loader_main",
            "pointcloud_concatenator = autodriver_pointcloud_preprocessor_tpu.cli:concatenator_main",
            "pointcloud_warmup = autodriver_pointcloud_preprocessor_tpu.cli:warmup_main",
        ],
    },
)
