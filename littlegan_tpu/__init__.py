"""LittleGAN-TPU: a TPU-native conditional GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of IXarea/LittleGAN
(conditional face generation + attribute adjustment on CelebA 128x128):

- one shared parameter pytree with three pure apply functions
  (generator / discriminator / adjuster) instead of Keras object aliasing
  (reference: model.py:108-136 wires Adjuster from D.encoder + G.decoder),
- a single jitted train step containing augmentation, one fused backward pass
  for all three losses, masked-Adam partition scheduling, and gradient psum
  over a `jax.sharding.Mesh` data axis,
- device-side input pipeline, orbax-style checkpointing, FID evaluation.

Reference file:line citations throughout point into /root/reference/.
"""

__version__ = "0.1.0"

from littlegan_tpu.config import Config, load_config  # noqa: F401
