from littlegan_tpu.data.celeba import CELEBA_ATTR_NAMES, CelebA  # noqa: F401
from littlegan_tpu.data.synthetic import SyntheticDataset  # noqa: F401
