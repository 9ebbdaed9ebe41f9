"""Compatibility importers for artifacts produced by the reference repo."""

from littlegan_tpu.compat.reference_checkpoint import (
    convert_reference_checkpoint,
    read_reference_variables,
    variables_to_params,
    variables_to_train_state,
)

__all__ = [
    "convert_reference_checkpoint",
    "read_reference_variables",
    "variables_to_params",
    "variables_to_train_state",
]
