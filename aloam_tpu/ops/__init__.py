from aloam_tpu.ops.linalg3 import eigh3, solve3  # noqa: F401
