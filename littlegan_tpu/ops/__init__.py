from littlegan_tpu.ops.norm import instance_norm  # noqa: F401
from littlegan_tpu.ops.conv import conv2d, deconv2d  # noqa: F401
from littlegan_tpu.ops.losses import (  # noqa: F401
    adjuster_loss,
    binary_crossentropy,
    discriminator_loss,
    generator_loss,
    mean_squared_error,
)
from littlegan_tpu.ops.augment import augment  # noqa: F401
