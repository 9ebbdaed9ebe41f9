"""Golden-value regression test: the exact training math must not drift.

Frozen on the CPU backend (f32) at build round 1. If an intentional change
to losses/step/optimizer alters these values, regenerate them and say why in
the commit message — an UNintentional change failing here is the point.
"""

import jax
import jax.numpy as jnp
import numpy as np

from littlegan_tpu.config import Config
from littlegan_tpu.training import create_train_state
from littlegan_tpu.training.step import make_train_step

GOLDEN = [
    {"loss/gen": 1.1731090545654297, "loss/disc": 4.106043815612793, "loss/adj": 1.1956162452697754},
    {"loss/gen": 1.373648762702942, "loss/disc": 4.241005897521973, "loss/adj": 1.588620662689209},
    {"loss/gen": 1.5862135887145996, "loss/disc": 4.260970115661621, "loss/adj": 1.4939842224121094},
]
# Regenerated (round 3) when adjust_hue switched from an HSV round trip to
# TF's exact chroma kernel (ops/augment.py) after tests/test_tf_oracle.py
# showed the round-trip form diverges from tf.image.adjust_hue on [-1,1]
# images. Only the D loss consumes the augmented image DIRECTLY, but every
# value moved: step 1's gen/adj by float-noise (different fusion of the
# shared forward), steps 2-3 everywhere because the changed D update
# propagates through the shared weights.


def test_three_step_loss_trajectory_golden():
    cfg = Config(
        batch_size=4, image_dim=16, init_dim=1, noise_dim=13,
        conv_filter=[24, 16, 12, 8, 4], compute_dtype="float32",
        use_partition=True, train_adj=True, donate_state=False, debug=True,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)

    def mk(k):
        k1, k2 = jax.random.split(k)
        img = jax.random.uniform(k1, (4, 16, 16, 3), minval=-1, maxval=1)
        cond = jnp.where(jax.random.bernoulli(k2, 0.5, (4, 7)), 0.98, -0.94)
        return img, cond

    ks = jax.random.split(jax.random.PRNGKey(42), 8)
    for i, want in enumerate(GOLDEN):
        out = step(
            state, mk(ks[2 * i]), mk(ks[2 * i + 1]),
            jax.random.fold_in(jax.random.PRNGKey(7), i), jnp.int32(i + 11),
        )
        state = out.state
        for key, val in want.items():
            got = float(out.metrics[key])
            np.testing.assert_allclose(got, val, rtol=5e-4, err_msg=f"step {i} {key}")
