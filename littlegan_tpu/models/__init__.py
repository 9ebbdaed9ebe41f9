from littlegan_tpu.models.littlegan import (  # noqa: F401
    ADJUSTER_TRAINABLE,
    DISCRIMINATOR_SUBTREES,
    GENERATOR_SUBTREES,
    adjuster_apply,
    decoder_apply,
    discriminator_apply,
    encoder_apply,
    generator_apply,
    init_params,
    param_count,
)
