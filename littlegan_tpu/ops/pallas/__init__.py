from littlegan_tpu.ops.pallas.norm_lrelu import fused_instance_norm_lrelu  # noqa: F401
