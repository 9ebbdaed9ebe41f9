from littlegan_tpu.eval.fid import (  # noqa: F401
    activation_statistics,
    frechet_distance,
    frechet_distance_newton_schulz,
)
