"""Two-way compatibility with the reference repo's artifacts: import its
tf.train.Checkpoints (and resume), export ours back to it, and export
TF-Serving SavedModels (compat/savedmodel.py)."""

from littlegan_tpu.compat.reference_checkpoint import (
    convert_reference_checkpoint,
    export_reference_checkpoint,
    read_reference_variables,
    variables_to_params,
    variables_to_train_state,
)

__all__ = [
    "convert_reference_checkpoint",
    "export_reference_checkpoint",
    "read_reference_variables",
    "variables_to_params",
    "variables_to_train_state",
]
