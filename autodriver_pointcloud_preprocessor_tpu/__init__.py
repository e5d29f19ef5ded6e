"""autodriver_pointcloud_preprocessor_tpu: TPU-native LiDAR point-cloud preprocessing.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``privvyledge/autodriver_pointcloud_preprocessor`` (ROS 2 + Open3D CUDA),
redesigned TPU-first: fixed-capacity masked point buffers, one fused XLA
program per pipeline configuration, and host I/O only at the edges.
"""

__version__ = "0.1.0"

from . import core, io, models, ops, runtime
from .core import ScanBuffer
from .models import Preprocessor
from .runtime import PointcloudPreprocessorNode

__all__ = [
    "core",
    "io",
    "models",
    "ops",
    "runtime",
    "ScanBuffer",
    "Preprocessor",
    "PointcloudPreprocessorNode",
    "__version__",
]
