from aloam_tpu.eval.ate import (ate_rmse, kitti_drift, rpe, rpe_rot,  # noqa: F401
                                umeyama_align)
