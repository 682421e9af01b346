"""fastlivo_tpu — a TPU-native LiDAR-Inertial-Visual Odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
FAST-LIVO-noted (tightly-coupled sparse-direct LIVO + mapping with GNSS
fusion, STD loop closure and pose-graph correction), built batched,
fixed-shape and functional for TPU:

- ``ops``      — SO(3)/SE(3) math, plane fit, voxel downsample, top-k,
                 bilinear patch sampling, Pallas kernels.
- ``models``   — estimation pipelines: IMU propagation, LIO point-to-plane
                 IESKF, photometric VIO, GNSS fusion, the full LIVO pipeline.
- ``maps``     — fixed-capacity voxel-hash LiDAR map and visual point map.
- ``parallel`` — device-mesh sharding of the hot residual/Jacobian paths
                 (shard points, psum innovations) via shard_map/pjit.
- ``io``       — sensor decoding (Livox/Velodyne/Ouster/XT32), measurement
                 logs, sync, TUM/PCD export.
- ``backend``  — STD loop closure, pose graph, visual loop verification.
- ``utils``    — config, timing/metrics (ATE/RPE), checkpointing, logging.

The reference system is a single C++/ROS process (see SURVEY.md at the repo
root); this framework replaces its callback-driven incremental design with
jitted fixed-shape kernels over tensor arenas, scaled over TPU meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# Filter numerics need true f32 matmuls: on TPU the default matmul precision
# routes f32 through bf16 MXU passes, which injects ~1e-3 relative error into
# the SO(3)/plane-fit/innovation algebra — far above the IESKF's convergence
# thresholds (0.01 deg / 0.15 mm). The hot paths here are gathers and
# elementwise VPU work, not matmul-bound, so the cost is negligible.
_jax.config.update("jax_default_matmul_precision", "highest")

from fastlivo_tpu.state import NavState  # noqa: F401
from fastlivo_tpu.utils.config import FastLivoConfig, load_config  # noqa: F401
