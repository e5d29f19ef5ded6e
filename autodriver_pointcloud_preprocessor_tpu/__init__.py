"""autodriver_pointcloud_preprocessor_tpu: TPU-native LiDAR point-cloud preprocessing.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``privvyledge/autodriver_pointcloud_preprocessor`` (ROS 2 + Open3D CUDA),
redesigned TPU-first: fixed-capacity masked point buffers, one fused XLA
program per pipeline configuration, and host I/O only at the edges.
"""

__version__ = "0.1.0"

from . import core
from .core import ScanBuffer

__all__ = ["core", "ScanBuffer", "__version__"]
