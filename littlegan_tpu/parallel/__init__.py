from littlegan_tpu.parallel.mesh import make_mesh, model_groups_within_process  # noqa: F401
from littlegan_tpu.parallel.train import (  # noqa: F401
    make_parallel_train_step,
    shard_batch,
    shard_local_batch,
    replicate_state,
)
from littlegan_tpu.parallel.zero import (  # noqa: F401
    check_shard_dense,
    check_shard_opt_state,
    place_state,
    train_state_shardings,
)
