from aloam_tpu.frontend.registration import register_scan  # noqa: F401
from aloam_tpu.frontend.features import extract_features  # noqa: F401
from aloam_tpu.frontend.voxel import (  # noqa: F401
    voxel_downsample_masked, voxel_downsample_rings)
