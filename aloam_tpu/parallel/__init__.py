from aloam_tpu.parallel.sharding import (  # noqa: F401
    batched_init, batched_step_fn, batched_step_jit, make_mesh, sharded_knn)
from aloam_tpu.parallel import distributed  # noqa: F401
