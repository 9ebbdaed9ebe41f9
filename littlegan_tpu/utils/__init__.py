from littlegan_tpu.utils.image import (  # noqa: F401
    data_rescale,
    inverse_rescale,
    save_image,
    soft,
    to_grid,
)
from littlegan_tpu.utils.provenance import init_result_dirs, snapshot_run  # noqa: F401
