from aloam_tpu.eval.ate import ate_rmse, rpe, umeyama_align  # noqa: F401
