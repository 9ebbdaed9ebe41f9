from littlegan_tpu.training.optimizer import AdamState, adam_init, masked_adam_update  # noqa: F401
from littlegan_tpu.training.partition import (  # noqa: F401
    build_partition_masks,
    resolve_mask,
)
from littlegan_tpu.training.state import TrainState, create_train_state  # noqa: F401
from littlegan_tpu.training.step import make_train_step  # noqa: F401
