"""TensorFlow-oracle parity tests.

The reference implementation IS TensorFlow/Keras (pinned tensorflow-gpu
1.15.4, reference requirements.txt:2).  With tensorflow + tf_keras available
in-container, every "exact reference math" claim this framework makes can be
checked against the real thing instead of a hand-derived simulation.  These
tests rebuild the reference architecture from its spec (model.py:6-136,
instance.py:105-128) with tf_keras layers, load IDENTICAL weights from our
param pytree, and assert three levels of parity:

- op level: InstanceNormalization (instance.py:114-116 eps-on-STD),
  SAME conv (model.py:15), SAME conv_transpose (model.py:38,90), Keras BCE
  incl. negative soft targets (eager_trainer.py:85-102), the tf.image
  augmentation kernels (eager_trainer.py:127-131), TF-v1 Adam
  (eager_trainer.py:28-30);
- model level: Generator / Discriminator / Adjuster forwards, both the plain
  path and the space-to-depth boundary path (ops/s2d.py) against the same
  TF oracle;
- step level: ONE full training step — the fused single-backward
  (training/step.py::total_loss_fn) reproduces the reference's three
  GradientTapes: same losses, same per-variable gradients, same post-Adam
  parameters.

BCE era note: TF 1.15's keras backend clips p to [eps, 1-eps] and round-trips
through logits into sigmoid_cross_entropy_with_logits — algebraically
``-(t*log(p) + (1-t)*log(1-p))`` on the clipped p, which is exactly
ops/losses.py.  Modern tf_keras (2.x) instead computes ``t*log(p + eps)``
with a SECOND epsilon inside the log — different at the clip boundary.  The
reference pins 1.15.4, so the 1.x construction is the oracle here; agreement
with modern tf_keras is asserted only away from the boundary.

Everything runs on CPU in float32; skipped when tensorflow is unavailable.
"""

from __future__ import annotations

import os

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # deterministic Eigen kernels
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
tfk = pytest.importorskip("tf_keras")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from littlegan_tpu.config import Config  # noqa: E402
from littlegan_tpu.models.littlegan import (  # noqa: E402
    adjuster_apply,
    discriminator_apply,
    generator_apply,
    init_params,
)
from littlegan_tpu.ops.augment import adjust_brightness, adjust_contrast, adjust_hue  # noqa: E402
from littlegan_tpu.ops.conv import conv2d, deconv2d  # noqa: E402
from littlegan_tpu.ops.losses import binary_crossentropy  # noqa: E402
from littlegan_tpu.ops.norm import instance_norm  # noqa: E402
from littlegan_tpu.training.optimizer import adam_init, masked_adam_update  # noqa: E402
from littlegan_tpu.training.partition import build_partition_masks  # noqa: E402
from littlegan_tpu.training.state import create_train_state  # noqa: E402
from littlegan_tpu.training.step import apply_updates, total_loss_fn  # noqa: E402
from littlegan_tpu.utils.image import soft  # noqa: E402


def _ocfg(**kw) -> Config:
    """Tiny reference-topology config for the oracle (16x16, 4 enc/dec blocks)."""
    base = dict(
        batch_size=4,
        image_dim=16,
        init_dim=1,
        noise_dim=13,
        attr=[0, 1, 2, 3, 4, 5, 6],
        conv_filter=[24, 16, 12, 8, 4],
        kernel_size=5,
        compute_dtype="float32",
        use_s2d=False,
        use_partition=False,
        train_adj=True,
        ema_decay=0.0,
        debug=True,
    )
    base.update(kw)
    return Config(**base)


# ------------------------------------------------------------- TF oracle ----


class _TFInstanceNorm:
    """instance.py:105-128 with axis=None: reduce over all non-batch axes,
    scalar (1,)-shaped gamma/beta, epsilon added to the STD."""

    def __init__(self, np_norm):
        self.gamma = tf.Variable(np.asarray(np_norm["gamma"], np.float32))
        self.beta = tf.Variable(np.asarray(np_norm["beta"], np.float32))

    def __call__(self, x):
        axes = list(range(1, len(x.shape)))
        mean = tf.reduce_mean(x, axes, keepdims=True)
        std = tf.sqrt(tf.reduce_mean(tf.square(x - mean), axes, keepdims=True)) + 1e-3
        return (x - mean) / std * self.gamma + self.beta


class TFOracle:
    """The reference model family (model.py:6-136) in tf_keras, weights
    loaded from our param pytree so forwards/gradients are comparable."""

    def __init__(self, cfg: Config, params):
        kl = tfk.layers
        cf, k = cfg.conv_filter, cfg.kernel_size
        self.cfg = cfg
        self.alpha = cfg.leaky_alpha
        p = jax.tree_util.tree_map(np.asarray, params)

        self.enc_convs, self.enc_norms = [], []
        for i in range(1, 5):  # model.py:13-16
            blk = p["encoder"][f"block{i}"]
            conv = kl.Conv2D(cf[4 - i], k, 2, "same")
            conv.build((None, None, None, blk["conv"]["kernel"].shape[2]))
            conv.set_weights([blk["conv"]["kernel"], blk["conv"]["bias"]])
            self.enc_convs.append(conv)
            self.enc_norms.append(_TFInstanceNorm(blk["norm"]))

        self.dec_convs, self.dec_norms = [], []
        for i in range(1, 5):  # model.py:37-41
            blk = p["decoder"][f"block{i}"]
            conv = kl.Conv2DTranspose(cf[i], k, (2, 2), "same")
            conv.build((None, None, None, blk["conv"]["kernel"].shape[3]))
            conv.set_weights([blk["conv"]["kernel"], blk["conv"]["bias"]])
            self.dec_convs.append(conv)
            self.dec_norms.append(_TFInstanceNorm(blk["norm"]))

        feat = cfg.init_dim**2 * cf[0]
        self.g_dense = kl.Dense(feat)  # model.py:83
        self.g_dense.build((None, cfg.noise_dim + cfg.cond_dim))
        self.g_dense.set_weights([p["g_head"]["dense"]["kernel"], p["g_head"]["dense"]["bias"]])
        self.g_norm = _TFInstanceNorm(p["g_head"]["norm"])
        self.out_conv = kl.Conv2DTranspose(cfg.image_channel, k, (1, 1), "same", activation="tanh")
        self.out_conv.build((None, None, None, cf[4]))  # model.py:86-87
        self.out_conv.set_weights([p["out_conv"]["kernel"], p["out_conv"]["bias"]])

        self.d_pr = kl.Dense(1, activation="sigmoid")  # model.py:62
        self.d_pr.build((None, feat))
        self.d_pr.set_weights([p["d_head"]["pr"]["kernel"], p["d_head"]["pr"]["bias"]])
        self.d_cond = kl.Dense(cfg.cond_dim, activation="sigmoid")  # model.py:63
        self.d_cond.build((None, feat))
        self.d_cond.set_weights([p["d_head"]["cond"]["kernel"], p["d_head"]["cond"]["bias"]])

        self.adj_dense = kl.Dense(feat)  # model.py:120
        self.adj_dense.build((None, cfg.cond_dim))
        self.adj_dense.set_weights([p["adj_head"]["dense"]["kernel"], p["adj_head"]["dense"]["bias"]])
        self.adj_norm = _TFInstanceNorm(p["adj_head"]["norm"])

    # forwards (model.py call methods; dropout inert, model.py:25)
    def encoder(self, x):
        outs = []
        for conv, nrm in zip(self.enc_convs, self.enc_norms):
            x = tf.nn.leaky_relu(nrm(conv(x)), self.alpha)
            outs.append(x)
        return outs

    def decoder(self, x, adds):
        for i, (conv, nrm) in enumerate(zip(self.dec_convs, self.dec_norms)):
            if adds[i] is not None:
                x = tf.add(x, adds[i])
            x = tf.nn.leaky_relu(nrm(conv(x)), self.alpha)
        return x

    def generator(self, noise, cond):  # model.py:89-105
        cfg = self.cfg
        x = tf.concat([noise, cond], -1)
        x = tf.nn.leaky_relu(self.g_dense(x), self.alpha)
        x = tf.reshape(x, [-1, cfg.init_dim, cfg.init_dim, cfg.conv_filter[0]])
        x = self.g_norm(x)
        x = self.decoder(x, [None] * 4)
        return self.out_conv(x)

    def discriminator(self, image):  # model.py:65-73
        fmaps = self.encoder(image)
        flat = tf.reshape(fmaps[-1], [int(image.shape[0]), -1])
        return self.d_pr(flat), self.d_cond(flat)

    def adjuster(self, image, cond):  # model.py:125-136
        fmaps = self.encoder(image)
        c = tf.nn.leaky_relu(self.adj_dense(cond), self.alpha)
        c = self.adj_norm(c)
        c = tf.reshape(c, [-1, self.cfg.init_dim, self.cfg.init_dim, self.cfg.conv_filter[0]])
        return self.out_conv(self.decoder(c, fmaps[::-1]))

    # variable lists in the SAME order as the _*_leaves helpers below
    def d_vars(self):
        vs = []
        for conv, nrm in zip(self.enc_convs, self.enc_norms):
            vs += [conv.kernel, conv.bias, nrm.gamma, nrm.beta]
        return vs + [self.d_pr.kernel, self.d_pr.bias, self.d_cond.kernel, self.d_cond.bias]

    def g_vars(self):
        vs = [self.g_dense.kernel, self.g_dense.bias, self.g_norm.gamma, self.g_norm.beta]
        for conv, nrm in zip(self.dec_convs, self.dec_norms):
            vs += [conv.kernel, conv.bias, nrm.gamma, nrm.beta]
        return vs + [self.out_conv.kernel, self.out_conv.bias]

    def a_vars(self):
        return [self.adj_dense.kernel, self.adj_dense.bias, self.adj_norm.gamma, self.adj_norm.beta]


def _d_leaves(tree):
    out = []
    for i in range(1, 5):
        blk = tree["encoder"][f"block{i}"]
        out += [blk["conv"]["kernel"], blk["conv"]["bias"], blk["norm"]["gamma"], blk["norm"]["beta"]]
    for head in ("pr", "cond"):
        out += [tree["d_head"][head]["kernel"], tree["d_head"][head]["bias"]]
    return out


def _g_leaves(tree):
    gh = tree["g_head"]
    out = [gh["dense"]["kernel"], gh["dense"]["bias"], gh["norm"]["gamma"], gh["norm"]["beta"]]
    for i in range(1, 5):
        blk = tree["decoder"][f"block{i}"]
        out += [blk["conv"]["kernel"], blk["conv"]["bias"], blk["norm"]["gamma"], blk["norm"]["beta"]]
    return out + [tree["out_conv"]["kernel"], tree["out_conv"]["bias"]]


def _a_leaves(tree):
    ah = tree["adj_head"]
    return [ah["dense"]["kernel"], ah["dense"]["bias"], ah["norm"]["gamma"], ah["norm"]["beta"]]


def _tf1_keras_bce(t, p):
    """tf.keras 1.15 backend.binary_crossentropy: clip to [eps, 1-eps], back
    to logits, sigmoid_cross_entropy_with_logits; losses.binary_crossentropy
    then means over the last axis."""
    eps = 1e-7
    p = tf.clip_by_value(tf.convert_to_tensor(p, tf.float32), eps, 1.0 - eps)
    logits = tf.math.log(p / (1.0 - p))
    per = tf.nn.sigmoid_cross_entropy_with_logits(labels=tf.convert_to_tensor(t, tf.float32), logits=logits)
    return tf.reduce_mean(per, axis=-1)


# ------------------------------------------------------------- op parity ----


def test_instance_norm_matches_reference_layer(np_rng):
    """ops/norm.py vs instance.py:105-128 built from tf ops (axis=None path),
    on 4-D activations and the adjuster's 2-D dense output (model.py:129-131)."""
    gamma = np.array([1.3], np.float32)
    beta = np.array([-0.2], np.float32)
    for shape in [(3, 5, 6, 4), (3, 24)]:
        x = (np_rng.standard_normal(shape) * 3).astype(np.float32)
        xt = tf.constant(x)
        axes = list(range(1, len(shape)))
        mean = tf.reduce_mean(xt, axes, keepdims=True)
        std = tf.sqrt(tf.reduce_mean(tf.square(xt - mean), axes, keepdims=True)) + 1e-3
        want = ((xt - mean) / std * gamma + beta).numpy()
        got_two = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), two_pass=True))
        got_one = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
        np.testing.assert_allclose(got_two, want, atol=2e-6, err_msg=f"two-pass {shape}")
        np.testing.assert_allclose(got_one, want, atol=1e-5, err_msg=f"one-pass {shape}")


def test_conv_ops_match_tf(np_rng):
    """ops/conv.py vs tf.nn: SAME stride-2 conv (model.py:15), SAME stride-2
    and stride-1 conv_transpose (model.py:38,90) — same kernels, same layouts."""
    x = np_rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = (np_rng.standard_normal((5, 5, 3, 7)) * 0.1).astype(np.float32)
    b = (np_rng.standard_normal((7,)) * 0.1).astype(np.float32)
    want = (tf.nn.conv2d(x, k, [1, 2, 2, 1], "SAME") + b).numpy()
    np.testing.assert_allclose(np.asarray(conv2d(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), stride=2)), want, atol=1e-5)

    kt = (np_rng.standard_normal((5, 5, 7, 3)) * 0.1).astype(np.float32)  # (kh,kw,out,in)
    bt = (np_rng.standard_normal((7,)) * 0.1).astype(np.float32)
    want2 = (tf.nn.conv2d_transpose(x, kt, [2, 16, 16, 7], [1, 2, 2, 1], "SAME") + bt).numpy()
    np.testing.assert_allclose(np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(kt), jnp.asarray(bt), stride=2)), want2, atol=1e-5)
    want1 = (tf.nn.conv2d_transpose(x, kt, [2, 8, 8, 7], [1, 1, 1, 1], "SAME") + bt).numpy()
    np.testing.assert_allclose(np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(kt), jnp.asarray(bt), stride=1)), want1, atol=1e-5)


def test_bce_matches_tf1_keras():
    """ops/losses.py vs the TF-1.15 keras BCE construction (what the
    reference pins), including negative soft targets and both clip
    boundaries; and vs MODERN tf_keras away from the boundary (where the 1.x
    and 2.x formulas agree)."""
    t_vals = np.array([soft(-1.0), soft(0.0), 0.5, soft(1.0)], np.float32)
    p_vals = np.array([1e-9, 1e-4, 0.3, 0.7, 1 - 1e-4, 1 - 1e-9], np.float32)
    t, p = np.meshgrid(t_vals, p_vals)
    t, p = t.reshape(-1, 4), p.reshape(-1, 4)
    want = _tf1_keras_bce(t, p).numpy()
    got = np.asarray(binary_crossentropy(t, p))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    interior = (p > 1e-3) & (p < 1 - 1e-3)
    t_i, p_i = t[interior.all(axis=-1)], p[interior.all(axis=-1)]
    want_modern = tfk.losses.binary_crossentropy(tf.constant(t_i), tf.constant(p_i)).numpy()
    np.testing.assert_allclose(np.asarray(binary_crossentropy(t_i, p_i)), want_modern, rtol=1e-5, atol=1e-6)


def test_augment_kernels_match_tf_image(np_rng):
    """adjust_hue / adjust_contrast / adjust_brightness vs tf.image on the
    [-1,1] range the reference actually feeds them (eager_trainer.py:127-130),
    plus [0,1] and wider ranges and the achromatic edge case."""
    images = [
        (np_rng.random((3, 5, 5, 3)) * 2 - 1).astype(np.float32),
        np_rng.random((3, 5, 5, 3)).astype(np.float32),
        (np_rng.random((2, 4, 4, 3)) * 10 - 5).astype(np.float32),
        np.full((1, 2, 2, 3), -0.3, np.float32),
    ]
    for img in images:
        for delta in (0.03, -0.03, 0.49):
            want = tf.image.adjust_hue(img, delta).numpy()
            got = np.asarray(adjust_hue(jnp.asarray(img), jnp.asarray(delta)))
            np.testing.assert_allclose(got, want, atol=2e-5, err_msg=f"hue {delta}")
        want_c = tf.image.adjust_contrast(img, 0.8).numpy()
        np.testing.assert_allclose(np.asarray(adjust_contrast(jnp.asarray(img), 0.8)), want_c, atol=1e-5)
        want_b = tf.image.adjust_brightness(img, 0.02).numpy()
        np.testing.assert_allclose(np.asarray(adjust_brightness(jnp.asarray(img), 0.02)), want_b, atol=1e-6)


def test_adam_matches_tf_v1(np_rng):
    """training/optimizer.py (mask=1) vs tf.compat.v1.train.AdamOptimizer —
    the exact optimizer the reference constructs (eager_trainer.py:28-30) —
    over 6 steps on mixed-magnitude gradients, both (0.5, 0.9) and the
    adjuster's default betas."""
    shapes = [(3, 2), (5,), (1,)]
    init = [np_rng.standard_normal(s).astype(np.float32) for s in shapes]
    grad_seq = [
        [(np_rng.standard_normal(s) * 10.0 ** np_rng.integers(-6, 1)).astype(np.float32) for s in shapes]
        for _ in range(6)
    ]
    for lr, b1, b2 in [(5e-5, 0.5, 0.9), (5e-5, 0.9, 0.999)]:
        tf_vars = [tf.Variable(v.copy()) for v in init]
        opt = tf.compat.v1.train.AdamOptimizer(lr, b1, b2)
        params = {f"p{i}": jnp.asarray(v) for i, v in enumerate(init)}
        state = adam_init(params)
        mask = jax.tree_util.tree_map(lambda _: jnp.float32(1.0), params)
        for grads in grad_seq:
            opt.apply_gradients(zip([tf.constant(g) for g in grads], tf_vars))
            gtree = {f"p{i}": jnp.asarray(g) for i, g in enumerate(grads)}
            params, state = masked_adam_update(gtree, state, params, mask, lr, b1, b2)
        for i, v in enumerate(tf_vars):
            np.testing.assert_allclose(
                np.asarray(params[f"p{i}"]), v.numpy(), rtol=1e-6, atol=1e-8,
                err_msg=f"betas=({b1},{b2}) leaf {i}",
            )


# ---------------------------------------------------------- model parity ----


@pytest.fixture(scope="module")
def oracle_setup():
    cfg = _ocfg()
    params = init_params(cfg, jax.random.PRNGKey(7))
    return cfg, params, TFOracle(cfg, params)


def test_model_forwards_match_tf(oracle_setup, np_rng):
    """Generator / Discriminator / Adjuster forward parity against the
    tf_keras oracle on identical weights (model.py:6-136), for BOTH the plain
    path and the s2d boundary path (same params, cfg.use_s2d=True)."""
    cfg, params, o = oracle_setup
    n = cfg.batch_size
    noise = np_rng.standard_normal((n, cfg.noise_dim)).astype(np.float32)
    cond = soft(np_rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
    image = (np_rng.random((n, cfg.image_dim, cfg.image_dim, 3)) * 2 - 1).astype(np.float32)

    want_gen = o.generator(tf.constant(noise), tf.constant(cond)).numpy()
    want_pr, want_c = (t.numpy() for t in o.discriminator(tf.constant(image)))
    want_adj = o.adjuster(tf.constant(image), tf.constant(cond)).numpy()

    for use_s2d in (False, True):
        c = cfg.replace(use_s2d=use_s2d)
        tag = f"s2d={use_s2d}"
        got_gen = np.asarray(generator_apply(params, jnp.asarray(noise), jnp.asarray(cond), c))
        np.testing.assert_allclose(got_gen, want_gen, atol=5e-5, err_msg=f"generator {tag}")
        pr, cc = discriminator_apply(params, jnp.asarray(image), c)
        np.testing.assert_allclose(np.asarray(pr), want_pr, atol=5e-5, err_msg=f"D pr {tag}")
        np.testing.assert_allclose(np.asarray(cc), want_c, atol=5e-5, err_msg=f"D cond {tag}")
        got_adj = np.asarray(adjuster_apply(params, jnp.asarray(image), jnp.asarray(cond), c))
        np.testing.assert_allclose(got_adj, want_adj, atol=5e-5, err_msg=f"adjuster {tag}")


# ----------------------------------------------------------- step parity ----


def _tf_reference_step(o, cfg, img1, img2, cond1, cond2, noise, new_image, with_adj=True):
    """The reference's exact three-tape recipe (eager_trainer.py:115-169) run
    on the TF oracle — shared by the single-step and trajectory parity tests
    so the recipe can only be fixed in one place. Returns losses, per-list
    gradients, and the forward artifacts. ``with_adj=False`` skips the
    adjuster tape (the batch_no warm-up gate, eager_trainer.py:152)."""
    l1 = cfg.l1_lambda
    mbce = lambda t, p: tf.reduce_mean(_tf1_keras_bce(t, p))
    with tf.GradientTape() as gen_tape, tf.GradientTape() as disc_tape:
        # convert_to_tensor (not tf.constant): identity on symbolic tensors,
        # so the recipe also traces under tf.function (scripts/baseline_anchor.py)
        fake = o.generator(tf.convert_to_tensor(noise), tf.convert_to_tensor(cond2))
        real_pr, real_c = o.discriminator(tf.convert_to_tensor(new_image))
        fake_pr, fake_c = o.discriminator(fake)
        d_loss = (
            2.0 * mbce(cond1, real_c)
            + mbce(soft(tf.ones_like(real_pr)), real_pr)
            + mbce(soft(tf.zeros_like(fake_pr)), fake_pr)
        )
        g_loss = mbce(soft(tf.ones_like(fake_pr)), fake_pr) + mbce(cond2, fake_c) + l1 * tf.reduce_mean(tf.abs(img2 - fake))
    out = {
        "fake": fake,
        "d_loss": d_loss,
        "g_loss": g_loss,
        "d_grads": disc_tape.gradient(d_loss, o.d_vars()),
        "g_grads": gen_tape.gradient(g_loss, o.g_vars()),
        "a_loss": None,
        "a_grads": None,
        "adj": None,
    }
    if with_adj:
        fake_const = tf.stop_gradient(fake)  # adj consumes fake as data (eager_trainer.py:157)
        adj_in_cond = (tf.concat([cond2, cond1], 0) + 1.0) * 0.5
        adj_tgt_cond = tf.concat([cond2, cond1], 0)
        adj_in_img = tf.concat([img1, fake_const], 0)
        adj_tgt_img = tf.concat([img2, img1], 0)
        with tf.GradientTape() as adj_tape:
            adj_img = o.adjuster(adj_in_img, adj_in_cond)
            adj_pr, adj_c = o.discriminator(adj_img)
            a_loss = (
                mbce(soft(tf.ones_like(adj_pr)), adj_pr)
                + mbce(adj_tgt_cond, adj_c)
                + l1 * tf.reduce_mean(tf.abs(adj_tgt_img - adj_img))
            )
        out["adj"] = adj_img
        out["a_loss"] = a_loss
        out["a_grads"] = adj_tape.gradient(a_loss, o.a_vars())
    return out


def test_train_step_matches_tf_tapes(np_rng):
    """ONE full training step vs the reference's exact recipe
    (eager_trainer.py:115-169) run under real tf.GradientTapes and three real
    tf.compat.v1 AdamOptimizers: same losses, same per-variable gradients
    (validating the stop_gradient routing of the fused backward), same
    clipped-D update, same post-Adam parameters."""
    cfg = _ocfg(use_clip=True)
    state = create_train_state(cfg, jax.random.PRNGKey(3))
    o = TFOracle(cfg, state.params)
    n = cfg.batch_size

    img1 = (np_rng.random((n, cfg.image_dim, cfg.image_dim, 3)) * 2 - 1).astype(np.float32)
    img2 = (np_rng.random((n, cfg.image_dim, cfg.image_dim, 3)) * 2 - 1).astype(np.float32)
    cond1 = soft(np_rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
    cond2 = soft(np_rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
    noise = np_rng.standard_normal((n, cfg.noise_dim)).astype(np.float32)
    # the augmented D input is an explicit input to total_loss_fn; feed the
    # same fixed tensor to both sides (augment parity is tested op-wise above)
    new_image = (img1 + 0.05 * np_rng.standard_normal(img1.shape)).astype(np.float32)

    # ---- ours: fused single backward + masked Adam tail ----
    part_masks = build_partition_masks(state.params)
    grads, aux = jax.grad(total_loss_fn, has_aux=True)(
        state.params, (jnp.asarray(img1), jnp.asarray(cond1)), (jnp.asarray(img2), jnp.asarray(cond2)),
        jnp.asarray(noise), jnp.asarray(new_image), jax.random.PRNGKey(9), cfg,
    )
    out = apply_updates(state, grads, aux, jnp.int32(12), cfg, part_masks)  # 12 > warm-up gate

    # ---- reference: three tapes (eager_trainer.py:133-168) ----
    ref = _tf_reference_step(o, cfg, img1, img2, cond1, cond2, noise, new_image)
    d_loss, g_loss, a_loss = ref["d_loss"], ref["g_loss"], ref["a_loss"]
    d_grads, g_grads, a_grads = ref["d_grads"], ref["g_grads"], ref["a_grads"]

    # losses + step artifacts
    np.testing.assert_allclose(float(aux["loss/disc"]), float(d_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux["loss/gen"]), float(g_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux["loss/adj"]), float(a_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux["fake"]), ref["fake"].numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(aux["adj"]), ref["adj"].numpy(), atol=5e-5)

    # per-variable gradients: the fused backward == three tapes
    for name, mine, ref in [
        ("D", _d_leaves(grads), d_grads),
        ("G", _g_leaves(grads), g_grads),
        ("A", _a_leaves(grads), a_grads),
    ]:
        assert len(mine) == len(ref)
        for i, (gm, gr) in enumerate(zip(mine, ref)):
            np.testing.assert_allclose(
                np.asarray(gm), gr.numpy(), rtol=5e-4, atol=5e-6, err_msg=f"{name} grad leaf {i}"
            )

    # reference optimizer tail (eager_trainer.py:146-168)
    if cfg.use_clip:
        d_grads = [tf.clip_by_value(g, -cfg.clip_range, cfg.clip_range) for g in d_grads]
    tf.compat.v1.train.AdamOptimizer(cfg.lr).apply_gradients(zip(a_grads, o.a_vars()))
    tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2).apply_gradients(zip(d_grads, o.d_vars()))
    tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2).apply_gradients(zip(g_grads, o.g_vars()))

    # Post-Adam parameters. Where the gradient is essentially zero (scalar
    # norm-param grads are whole-fmap reductions that cancel to ~1e-7),
    # first-step Adam is sign-like — m/(sqrt(v)+eps) ~ (1-b1)/sqrt(1-b2) —
    # so backend fp noise on the grad legitimately moves the update by a
    # large fraction.  Compare strictly on meaningful-gradient elements and
    # bound noise-regime elements by the provable first-step Adam bound
    # |update| <= lr (so |diff| <= 2*lr).
    new = out.state.params
    for name, mine, ref, gref in [
        ("D", _d_leaves(new), o.d_vars(), d_grads),
        ("G", _g_leaves(new), o.g_vars(), g_grads),
        ("A", _a_leaves(new), o.a_vars(), a_grads),
    ]:
        for i, (pm, pr, gr) in enumerate(zip(mine, ref, gref)):
            pm, pr, gr = np.asarray(pm), pr.numpy(), gr.numpy()
            meaningful = np.abs(gr) > 1e-5
            np.testing.assert_allclose(
                pm[meaningful], pr[meaningful], rtol=1e-5, atol=2e-6,
                err_msg=f"{name} param leaf {i}",
            )
            np.testing.assert_array_less(
                np.abs(pm - pr), 2.0 * cfg.lr + 1e-9, err_msg=f"{name} param leaf {i} (noise bound)"
            )


def test_tb_event_file_readable_by_tf(tmp_path):
    """The from-scratch TensorBoard writer (utils/tensorboard.py — hand-rolled
    TFRecord framing, masked CRC32C, Event/Summary protos) read back by
    TensorFlow's own summary_iterator, which validates the CRCs and parses
    the protos: file_version, tags, float values, steps (incl. a >2^32
    varint step), wall times."""
    from littlegan_tpu.utils.tensorboard import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.scalar("loss/gen", 1.5, 1)
    w.scalars([("loss/disc", 2.25), ("loss/adj", -0.5)], 2)
    w.scalar("metrics/τ-unicode", 3.14159, 2**40)
    w.close()
    (fname,) = tmp_path.glob("events.out.tfevents.*")

    events = list(tf.compat.v1.train.summary_iterator(str(fname)))
    assert events[0].file_version == "brain.Event:2"
    got = [
        (v.tag, round(float(v.simple_value), 5), int(e.step))
        for e in events[1:]
        for v in e.summary.value
    ]
    assert got == [
        ("loss/gen", 1.5, 1),
        ("loss/disc", 2.25, 2),
        ("loss/adj", -0.5, 2),
        ("metrics/τ-unicode", 3.14159, 2**40),
    ]
    assert all(e.wall_time > 1e9 for e in events)


def test_jpeg_decode_matches_tf(tmp_path, np_rng):
    """Pipeline JPEG decode (PIL; the native loader is asserted byte-equal to
    PIL in tests/test_data.py) vs TensorFlow's decoder, which is what the
    reference feeds its network (dataset.py:26-27).  libjpeg's accurate iDCT
    (JDCT_ISLOW — PIL's default) should match tf.io.decode_jpeg with
    dct_method='INTEGER_ACCURATE' byte-exactly; TF's default method is
    allowed to differ by a couple of 8-bit LSBs (documented decoder-mode
    variation WITHIN TensorFlow itself, not a pipeline deviation)."""
    from PIL import Image

    from littlegan_tpu.data.celeba import _decode_pil

    dim = 64
    arr = (np_rng.random((dim, dim, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=92)

    ours = _decode_pil(str(p), dim, 3)
    assert ours.shape == (dim, dim, 3) and ours.dtype == np.uint8

    raw = tf.io.read_file(str(p))
    tf_accurate = tf.io.decode_jpeg(raw, channels=3, dct_method="INTEGER_ACCURATE").numpy()
    np.testing.assert_array_equal(ours, tf_accurate)

    tf_default = tf.io.decode_jpeg(raw, channels=3).numpy()
    # random-noise JPEG is the iDCT worst case; measured max delta 6 LSBs
    assert np.abs(ours.astype(np.int16) - tf_default.astype(np.int16)).max() <= 8


def test_partitioned_trajectory_matches_tf(np_rng):
    """EIGHT consecutive training steps (batch_no 8..15) against the
    reference recipe with its subtlest semantics all ON:

    - the partition schedule (eager_trainer.py:104-113) with interval=1, so
      even batches train one rotating weight-index group ([0:4)/[4:8)/[8:22)
      for G, [0:12)/[12:16)/[16:20) for D) and odd batches train everything;
    - Config.adam_tf_parity: v1 Adam's SHARED beta-power pair ticks on every
      apply even for weights outside the var_list (three persistent
      tf.compat.v1 optimizers on the TF side);
    - the adjuster warm-up gate crossing batch_no > 10 mid-run
      (eager_trainer.py:152): no adj tape, no adj optimizer tick before it;
    - D-gradient clipping on the selected vars (eager_trainer.py:146-148).

    Asserts per-step gradient parity (schedule divergence would compound
    into the step-k gradients) and final-parameter parity under the
    noise-regime bound of the single-step test, scaled by step count."""
    n_steps, b0 = 8, 8
    cfg = _ocfg(use_clip=True, use_partition=True, partition_interval=1, adam_tf_parity=True)
    state = create_train_state(cfg, jax.random.PRNGKey(5))
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    o = TFOracle(cfg, state.params)
    part_masks = build_partition_masks(state.params)
    n = cfg.batch_size

    gen_opt = tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2)
    disc_opt = tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2)
    adj_opt = tf.compat.v1.train.AdamOptimizer(cfg.lr)

    g_groups = [(0, 4), (4, 8), (8, 22)]  # eager_trainer.py:48-52
    d_groups = [(0, 12), (12, 16), (16, 20)]

    def select(vars_, grads_, groups, batch_no):
        period = cfg.partition_interval + 1
        if batch_no % period == 0:
            lo, hi = groups[(batch_no // period) % len(groups)]
            return vars_[lo:hi], grads_[lo:hi]
        return vars_, grads_

    for s in range(n_steps):
        b = b0 + s
        img1 = (np_rng.random((n, cfg.image_dim, cfg.image_dim, 3)) * 2 - 1).astype(np.float32)
        img2 = (np_rng.random((n, cfg.image_dim, cfg.image_dim, 3)) * 2 - 1).astype(np.float32)
        cond1 = soft(np_rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
        cond2 = soft(np_rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
        noise = np_rng.standard_normal((n, cfg.noise_dim)).astype(np.float32)
        new_image = (img1 + 0.05 * np_rng.standard_normal(img1.shape)).astype(np.float32)

        grads, aux = jax.grad(total_loss_fn, has_aux=True)(
            state.params, (jnp.asarray(img1), jnp.asarray(cond1)), (jnp.asarray(img2), jnp.asarray(cond2)),
            jnp.asarray(noise), jnp.asarray(new_image), jax.random.PRNGKey(90 + s), cfg,
        )
        state = apply_updates(state, grads, aux, jnp.int32(b), cfg, part_masks).state

        ref = _tf_reference_step(
            o, cfg, img1, img2, cond1, cond2, noise, new_image, with_adj=b > 10
        )
        d_grads, g_grads = ref["d_grads"], ref["g_grads"]

        np.testing.assert_allclose(float(aux["loss/disc"]), float(ref["d_loss"]), rtol=2e-4, err_msg=f"step {b} d_loss")
        np.testing.assert_allclose(float(aux["loss/gen"]), float(ref["g_loss"]), rtol=2e-4, err_msg=f"step {b} g_loss")
        for i, (gm, gr) in enumerate(zip(_d_leaves(grads) + _g_leaves(grads), d_grads + g_grads)):
            np.testing.assert_allclose(
                np.asarray(gm), gr.numpy(), rtol=2e-3, atol=2e-5, err_msg=f"step {b} grad leaf {i}"
            )

        if b > 10:  # adjuster tape + apply only past the warm-up gate
            np.testing.assert_allclose(float(aux["loss/adj"]), float(ref["a_loss"]), rtol=2e-4, err_msg=f"step {b} a_loss")
            adj_opt.apply_gradients(zip(ref["a_grads"], o.a_vars()))

        dv, dg = select(o.d_vars(), d_grads, d_groups, b)
        if cfg.use_clip:
            dg = [tf.clip_by_value(g, -cfg.clip_range, cfg.clip_range) for g in dg]
        disc_opt.apply_gradients(zip(dg, dv))
        gv, gg = select(o.g_vars(), g_grads, g_groups, b)
        gen_opt.apply_gradients(zip(gg, gv))

    # final params: strict on meaningfully-moved elements, noise bound scaled
    # by the number of applied steps elsewhere
    new = jax.tree_util.tree_map(np.asarray, state.params)
    for name, mine, ref, init in [
        ("D", _d_leaves(new), o.d_vars(), _d_leaves(p0)),
        ("G", _g_leaves(new), o.g_vars(), _g_leaves(p0)),
        ("A", _a_leaves(new), o.a_vars(), _a_leaves(p0)),
    ]:
        for i, (pm, pr, pi) in enumerate(zip(mine, ref, init)):
            pr = pr.numpy()
            upd = np.abs(pr - pi)
            allowed = np.maximum(0.05 * upd, 2.0 * cfg.lr * n_steps)
            np.testing.assert_array_less(
                np.abs(pm - pr), allowed + 1e-9, err_msg=f"{name} final param leaf {i}"
            )


def test_tb_image_summary_readable_by_tf(tmp_path, np_rng):
    """SummaryWriter.image (hand-rolled legacy Summary.Image proto) read back
    by TF's summary_iterator: tag, dims, colorspace, and PNG pixels survive
    the round trip bit-exactly for RGB and greyscale."""
    from littlegan_tpu.utils.tensorboard import SummaryWriter

    rgb = np_rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    grey = np_rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    w = SummaryWriter(str(tmp_path))
    w.image("test/gen", rgb, 7)
    w.image("test/grey", grey, 9)
    w.close()
    (fname,) = tmp_path.glob("events.out.tfevents.*")

    got = {}
    for e in tf.compat.v1.train.summary_iterator(str(fname)):
        for v in e.summary.value:
            if v.HasField("image"):
                got[v.tag] = (int(e.step), v.image)
    step, img = got["test/gen"]
    assert step == 7 and (img.height, img.width, img.colorspace) == (24, 16, 3)
    decoded = tf.io.decode_png(img.encoded_image_string).numpy()
    np.testing.assert_array_equal(decoded, rgb)
    step, img = got["test/grey"]
    assert step == 9 and (img.height, img.width, img.colorspace) == (8, 8, 1)
    decoded = tf.io.decode_png(img.encoded_image_string).numpy()
    np.testing.assert_array_equal(decoded[:, :, 0], grey[:, :, 0])


def test_tb_reader_parses_tf_written_events(tmp_path):
    """The reverse oracle direction: an event file written by TENSORFLOW's
    own summary writer parses identically through the dependency-free reader
    (utils/tensorboard.py::read_scalars) — framing, CRCs, varint steps,
    Summary.Value simple_value floats."""
    from littlegan_tpu.utils.tensorboard import read_scalars

    d = str(tmp_path / "tflog")
    w = tf.summary.create_file_writer(d)
    with w.as_default():
        for s in range(5):
            tf.summary.scalar("loss/gen", 1.0 / (s + 1), step=s)
            tf.summary.scalar("loss/disc", 2.0 + s, step=s)
        tf.summary.scalar("big/step", 7.0, step=2**40)
    w.close()

    got = read_scalars(d)
    assert [s for s, _ in got["loss/gen"]] == list(range(5))
    np.testing.assert_allclose(
        [v for _, v in got["loss/disc"]], [2.0, 3.0, 4.0, 5.0, 6.0], rtol=1e-6
    )
    assert got["big/step"] == [(2**40, 7.0)]
