"""Reference-checkpoint import (littlegan_tpu/compat/reference_checkpoint.py).

The fixture rebuilds the reference's EXACT trackable graph — attribute names
from model.py:6-136, the Adjuster sharing D.encoder + G.decoder + G.conv
(model.py:119-123), three v1 Adam optimizers under the same
``tf.train.Checkpoint`` kwargs as eager_trainer.py:31-36 — saves a real TF
checkpoint, and asserts the converter recovers weights, optimizer slots,
apply counts, and the architecture bit-for-bit. Mapping edge cases
(missing/conflicting keys, beta-power underflow) run numpy-only.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from littlegan_tpu.compat.reference_checkpoint import (
    _CONVERGED_COUNT,
    convert_reference_checkpoint,
    read_reference_variables,
    variables_to_params,
    variables_to_train_state,
)
from littlegan_tpu.config import Config
from littlegan_tpu.models import generator_apply, init_params
from littlegan_tpu.training.checkpoint import Checkpointer
from littlegan_tpu.training.state import create_train_state


def _cfg(**kw) -> Config:
    base = dict(
        image_dim=16,
        init_dim=1,
        noise_dim=13,
        attr=list(range(7)),
        conv_filter=[24, 16, 12, 8, 4],
        compute_dtype="float32",
        debug=True,
    )
    base.update(kw)
    return Config(**base)


def _random_params(cfg: Config, seed: int = 3):
    """init_params with EVERY leaf randomized — init's gamma=1/beta=0/bias=0
    would make gamma<->beta or bias swaps invisible to a roundtrip test."""
    params = init_params(cfg, jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    leaves = [jnp.asarray(rng.normal(size=np.shape(l)).astype(np.float32)) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _vars_from_params(params) -> dict:
    """Synthesize the checkpoint's logical-variable dict straight from a
    param tree (numpy-only fixture: shared modules under the roots TF's
    traversal picks in practice — adjuster/*)."""
    v = {}
    for i in range(1, 5):
        eb, db = params["encoder"][f"block{i}"], params["decoder"][f"block{i}"]
        for root, blk in (("adjuster/encoder", eb), ("adjuster/decoder", db)):
            v[f"{root}/conv{i}/kernel"] = np.asarray(blk["conv"]["kernel"])
            v[f"{root}/conv{i}/bias"] = np.asarray(blk["conv"]["bias"])
            v[f"{root}/norm{i}/gamma"] = np.asarray(blk["norm"]["gamma"])
            v[f"{root}/norm{i}/beta"] = np.asarray(blk["norm"]["beta"])
    v["generator/dense/kernel"] = np.asarray(params["g_head"]["dense"]["kernel"])
    v["generator/dense/bias"] = np.asarray(params["g_head"]["dense"]["bias"])
    v["generator/norm/gamma"] = np.asarray(params["g_head"]["norm"]["gamma"])
    v["generator/norm/beta"] = np.asarray(params["g_head"]["norm"]["beta"])
    v["adjuster/conv/kernel"] = np.asarray(params["out_conv"]["kernel"])
    v["adjuster/conv/bias"] = np.asarray(params["out_conv"]["bias"])
    v["discriminator/dense_pr/kernel"] = np.asarray(params["d_head"]["pr"]["kernel"])
    v["discriminator/dense_pr/bias"] = np.asarray(params["d_head"]["pr"]["bias"])
    v["discriminator/dense_cond/kernel"] = np.asarray(params["d_head"]["cond"]["kernel"])
    v["discriminator/dense_cond/bias"] = np.asarray(params["d_head"]["cond"]["bias"])
    v["adjuster/dense/kernel"] = np.asarray(params["adj_head"]["dense"]["kernel"])
    v["adjuster/dense/bias"] = np.asarray(params["adj_head"]["dense"]["bias"])
    v["adjuster/norm/gamma"] = np.asarray(params["adj_head"]["norm"]["gamma"])
    v["adjuster/norm/beta"] = np.asarray(params["adj_head"]["norm"]["beta"])
    return v


def _build_tf_checkpoint(tmp_path, cfg: Config, params, d_applies=0, g_applies=0, a_applies=0):
    """A real tf.train.Checkpoint with the reference's trackable graph.

    Returns the checkpoint directory. ``*_applies``: how many times each v1
    optimizer applies (constant) gradients to a SUBSET of its model's
    variables before saving — creating slots for those vars and ticking the
    optimizer's shared beta powers, like reference training does.
    """
    tf = pytest.importorskip("tensorflow")

    class Mod(tf.Module):
        pass

    def var(a):
        return tf.Variable(np.asarray(a, np.float32))

    def conv_mod(blk):
        m = Mod()
        m.kernel = var(blk["conv"]["kernel"])
        m.bias = var(blk["conv"]["bias"])
        return m

    def norm_mod(nm):
        m = Mod()
        m.gamma = var(nm["gamma"])
        m.beta = var(nm["beta"])
        return m

    def dense_mod(d):
        m = Mod()
        m.kernel = var(d["kernel"])
        m.bias = var(d["bias"])
        return m

    enc, dec = Mod(), Mod()
    for i in range(1, 5):
        setattr(enc, f"conv{i}", conv_mod(params["encoder"][f"block{i}"]))
        setattr(enc, f"norm{i}", norm_mod(params["encoder"][f"block{i}"]["norm"]))
        setattr(dec, f"conv{i}", conv_mod(params["decoder"][f"block{i}"]))
        setattr(dec, f"norm{i}", norm_mod(params["decoder"][f"block{i}"]["norm"]))
    disc = Mod()
    disc.encoder = enc
    disc.dense_pr = dense_mod(params["d_head"]["pr"])
    disc.dense_cond = dense_mod(params["d_head"]["cond"])
    gen = Mod()
    gen.dense = dense_mod(params["g_head"]["dense"])
    gen.norm = norm_mod(params["g_head"]["norm"])
    gen.decoder = dec
    out = Mod()
    out.kernel = var(params["out_conv"]["kernel"])
    out.bias = var(params["out_conv"]["bias"])
    gen.conv = out
    adj = Mod()
    adj.encoder = enc
    adj.dense = dense_mod(params["adj_head"]["dense"])
    adj.norm = norm_mod(params["adj_head"]["norm"])
    adj.decoder = dec
    adj.conv = out

    opt_d = tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2)
    opt_g = tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2)
    opt_a = tf.compat.v1.train.AdamOptimizer(cfg.lr)

    def apply_n(opt, variables, n):
        for _ in range(n):
            opt.apply_gradients([(tf.ones_like(v), v) for v in variables])

    # subsets, like the reference's partition schedule (eager_trainer.py:48-52)
    apply_n(opt_d, [enc.conv1.kernel, disc.dense_pr.kernel], d_applies)
    apply_n(opt_g, [dec.conv1.kernel, out.kernel], g_applies)
    apply_n(opt_a, [adj.dense.kernel], a_applies)

    ckpt = tf.train.Checkpoint(
        discriminator=disc,
        generator=gen,
        adjuster=adj,
        discriminator_optimizer=opt_d,
        generator_optimizer=opt_g,
        adjuster_optimizer=opt_a,
    )
    ckdir = tmp_path / "refckpt"
    ckpt.save(os.fspath(ckdir / "7"))
    return os.fspath(ckdir)


def _assert_trees_equal(a, b):
    ap = jax.tree_util.tree_leaves_with_path(a)
    bp = {p: l for p, l in jax.tree_util.tree_leaves_with_path(b)}
    assert len(ap) == len(bp)
    for p, la in ap:
        np.testing.assert_array_equal(np.asarray(la), np.asarray(bp[p]), err_msg=str(p))


def _build_keras_checkpoint(tmp_path, cfg, params):
    """The same trackable graph built from REAL keras objects — subclassed
    Models, keras Conv2D/Dense layers, and an add_weight-based
    InstanceNormalization clone (instance.py:88-100 assigns the weights to
    ``self.gamma``/``self.beta``, which is what names the checkpoint keys).
    Proves the importer's key schema holds for what the reference's actual
    classes serialize, not just for the tf.Module fixture."""
    tf = pytest.importorskip("tensorflow")
    tfk = pytest.importorskip("tf_keras")

    class Norm(tfk.layers.Layer):  # instance.py:72-103 weight layout
        def build(self, _):
            self.gamma = self.add_weight(shape=(1,), name="gamma")
            self.beta = self.add_weight(shape=(1,), name="beta")

        def call(self, x):
            return x * self.gamma + self.beta

    def set_conv(layer, blk):
        layer.set_weights([blk["conv"]["kernel"], blk["conv"]["bias"]])

    def set_norm(layer, nm):
        layer.set_weights([nm["gamma"], nm["beta"]])

    cf, k = cfg.conv_filter, cfg.kernel_size

    class Encoder(tfk.Model):  # model.py:6-27 attribute names
        def __init__(self):
            super().__init__()
            for i in range(1, 5):
                setattr(self, f"conv{i}", tfk.layers.Conv2D(cf[4 - i], k, 2, "same"))
                setattr(self, f"norm{i}", Norm())

        def call(self, x):
            for i in range(1, 5):
                x = getattr(self, f"norm{i}")(getattr(self, f"conv{i}")(x))
            return x

    class Decoder(tfk.Model):  # model.py:30-51
        def __init__(self):
            super().__init__()
            for i in range(1, 5):
                setattr(self, f"conv{i}", tfk.layers.Conv2DTranspose(cf[i], k, 2, "same"))
                setattr(self, f"norm{i}", Norm())

        def call(self, x):
            for i in range(1, 5):
                x = getattr(self, f"norm{i}")(getattr(self, f"conv{i}")(x))
            return x

    class Discriminator(tfk.Model):  # model.py:54-73
        def __init__(self, enc):
            super().__init__()
            self.encoder = enc
            self.dense_pr = tfk.layers.Dense(1)
            self.dense_cond = tfk.layers.Dense(cfg.cond_dim)

        def call(self, x):
            f = tf.reshape(self.encoder(x), (x.shape[0], -1))
            return self.dense_pr(f), self.dense_cond(f)

    class Generator(tfk.Model):  # model.py:76-105
        def __init__(self, dec):
            super().__init__()
            feat = cfg.init_dim**2 * cf[0]
            self.dense = tfk.layers.Dense(feat)
            self.norm = Norm()
            self.decoder = dec
            self.conv = tfk.layers.Conv2DTranspose(cfg.image_channel, k, 1, "same")

        def call(self, z):
            x = self.norm(self.dense(z))
            x = tf.reshape(x, (-1, cfg.init_dim, cfg.init_dim, cf[0]))
            return self.conv(self.decoder(x))

    class Adjuster(tfk.Model):  # model.py:108-136 sharing
        def __init__(self, disc, gen):
            super().__init__()
            self.encoder = disc.encoder
            self.dense = tfk.layers.Dense(cfg.init_dim**2 * cf[0])
            self.norm = Norm()
            self.decoder = gen.decoder
            self.conv = gen.conv

        def call(self, inputs):
            img, cond = inputs
            self.encoder(img)
            c = self.norm(self.dense(cond))
            c = tf.reshape(c, (-1, cfg.init_dim, cfg.init_dim, cf[0]))
            return self.conv(self.decoder(c))

    enc, dec = Encoder(), Decoder()
    disc, gen = Discriminator(enc), Generator(dec)
    adj = Adjuster(disc, gen)
    img = np.zeros((1, cfg.image_dim, cfg.image_dim, cfg.image_channel), np.float32)
    z = np.zeros((1, cfg.noise_dim + cfg.cond_dim), np.float32)
    disc(img), gen(z), adj([img, np.zeros((1, cfg.cond_dim), np.float32)])  # build

    for i in range(1, 5):
        set_conv(getattr(enc, f"conv{i}"), params["encoder"][f"block{i}"])
        set_norm(getattr(enc, f"norm{i}"), params["encoder"][f"block{i}"]["norm"])
        set_conv(getattr(dec, f"conv{i}"), params["decoder"][f"block{i}"])
        set_norm(getattr(dec, f"norm{i}"), params["decoder"][f"block{i}"]["norm"])
    gen.dense.set_weights([params["g_head"]["dense"]["kernel"], params["g_head"]["dense"]["bias"]])
    set_norm(gen.norm, params["g_head"]["norm"])
    gen.conv.set_weights([params["out_conv"]["kernel"], params["out_conv"]["bias"]])
    disc.dense_pr.set_weights([params["d_head"]["pr"]["kernel"], params["d_head"]["pr"]["bias"]])
    disc.dense_cond.set_weights(
        [params["d_head"]["cond"]["kernel"], params["d_head"]["cond"]["bias"]]
    )
    adj.dense.set_weights(
        [params["adj_head"]["dense"]["kernel"], params["adj_head"]["dense"]["bias"]]
    )
    set_norm(adj.norm, params["adj_head"]["norm"])

    ckpt = tf.train.Checkpoint(discriminator=disc, generator=gen, adjuster=adj)
    ckdir = tmp_path / "refkeras"
    ckpt.save(os.fspath(ckdir / "3"))
    return os.fspath(ckdir)


# ---------------------------------------------------------------- TF fixture


@pytest.mark.parametrize("builder", [_build_tf_checkpoint, _build_keras_checkpoint])
def test_weights_roundtrip_through_tf_checkpoint(tmp_path, builder):
    cfg = _cfg()
    p0 = _random_params(cfg)
    src = builder(tmp_path, cfg, p0)
    variables = read_reference_variables(src)
    params, _, inferred = variables_to_params(variables)
    _assert_trees_equal(p0, params)
    assert inferred == {
        "kernel_size": 5,
        "image_channel": 3,
        "conv_filter": [24, 16, 12, 8, 4],
        "attr": list(range(7)),
        "noise_dim": 13,
        "init_dim": 1,
        "image_dim": 16,
    }


def test_optimizer_slots_counts_and_disk_restore(tmp_path):
    cfg = _cfg()
    p0 = _random_params(cfg)
    src = _build_tf_checkpoint(tmp_path, cfg, p0, d_applies=3, g_applies=2, a_applies=0)
    out_dir = os.fspath(tmp_path / "native")
    summary = convert_reference_checkpoint(src, out_dir, beta_1=cfg.beta_1, beta_2=cfg.beta_2)
    # counts: one shared beta-power tick per apply_gradients call, even
    # though each call touched only a subset (v1 semantics = adam_tf_parity)
    assert summary["optimizers"] == {"opt_g": 2, "opt_d": 3, "opt_a": None}
    assert summary["tag"] == "0"  # no source status.json

    template = create_train_state(cfg, jax.random.PRNGKey(1))
    state, status = Checkpointer(out_dir).restore_latest(template)
    assert status["epoch"] == 1 and status["step"] == 3

    variables = read_reference_variables(src)
    # applied vars carry the POST-update values (apply_gradients mutated
    # them before the save) — the converted params must match the file
    np.testing.assert_array_equal(
        np.asarray(state.params["d_head"]["pr"]["kernel"]),
        variables["discriminator/dense_pr/kernel"],
    )
    # untouched vars still equal the source tree
    np.testing.assert_array_equal(
        np.asarray(state.params["g_head"]["dense"]["kernel"]),
        np.asarray(p0["g_head"]["dense"]["kernel"]),
    )
    slot = "/.OPTIMIZER_SLOT/discriminator_optimizer/"
    np.testing.assert_array_equal(
        np.asarray(state.opt_d.mu["encoder"]["block1"]["conv"]["kernel"]),
        variables["adjuster/encoder/conv1/kernel" + slot + "m"],
    )
    np.testing.assert_array_equal(
        np.asarray(state.opt_d.nu["d_head"]["pr"]["kernel"]),
        variables["discriminator/dense_pr/kernel" + slot + "v"],
    )
    # vars the optimizer never touched: zero moments, but the SHARED count
    assert np.all(np.asarray(state.opt_d.mu["encoder"]["block2"]["conv"]["kernel"]) == 0)
    for leaf in jax.tree_util.tree_leaves(state.opt_d.count):
        assert int(leaf) == 3
    for leaf in jax.tree_util.tree_leaves(state.opt_g.count):
        assert int(leaf) == 2
    for leaf in jax.tree_util.tree_leaves(state.opt_a.count):
        assert int(leaf) == 0

    # the restored state is directly usable
    noise = jnp.zeros((2, cfg.noise_dim), jnp.float32)
    cond = jnp.zeros((2, cfg.cond_dim), jnp.float32)
    img = generator_apply(state.params, noise, cond, cfg)
    assert img.shape == (2, 16, 16, 3) and bool(jnp.all(jnp.isfinite(img)))


def test_weights_only_and_status_tag(tmp_path):
    cfg = _cfg()
    p0 = _random_params(cfg)
    src = _build_tf_checkpoint(tmp_path, cfg, p0)
    # reference interrupt handler writes {'epoch': next-to-train}
    with open(os.path.join(src, "status.json"), "w") as f:
        json.dump({"epoch": 8}, f)

    out_full = os.fspath(tmp_path / "full")
    summary = convert_reference_checkpoint(src, out_full)
    assert summary["tag"] == "7"
    with open(os.path.join(out_full, "status.json")) as f:
        assert json.load(f)["epoch"] == 8  # resume trains epoch 8, like the ref

    out_w = os.fspath(tmp_path / "weights")
    summary_w = convert_reference_checkpoint(src, out_w, weights_only=True)
    restored = Checkpointer(out_w).restore("model", init_params(cfg, jax.random.PRNGKey(1)))
    _assert_trees_equal(p0, restored)
    assert summary_w["path"].endswith("ckpt-model.npz")


# ------------------------------------------------------------- numpy-only


def test_mapping_missing_and_conflicting_keys():
    cfg = _cfg()
    v = _vars_from_params(_random_params(cfg))
    broken = dict(v)
    del broken["adjuster/encoder/conv1/kernel"]
    with pytest.raises(KeyError, match="conv1/kernel"):
        variables_to_params(broken)

    dup = dict(v)
    dup["discriminator/encoder/conv1/kernel"] = v["adjuster/encoder/conv1/kernel"] + 1.0
    with pytest.raises(ValueError, match="conflicting"):
        variables_to_params(dup)

    # equal duplicates under both sharing-legal roots are fine
    ok = dict(v)
    ok["discriminator/encoder/conv1/kernel"] = v["adjuster/encoder/conv1/kernel"].copy()
    variables_to_params(ok)


def test_underflowed_beta_powers_use_converged_count():
    cfg = _cfg()
    v = _vars_from_params(_random_params(cfg))
    # long-trained reference run: 0.5^t and 0.9^t both underflowed to 0.0
    v["discriminator_optimizer/beta1_power"] = np.float32(0.0)
    v["discriminator_optimizer/beta2_power"] = np.float32(0.0)
    # mid-range g run: beta1 underflowed, beta2 still exact (t=2000)
    v["generator_optimizer/beta1_power"] = np.float32(0.0)
    v["generator_optimizer/beta2_power"] = np.float64(0.9 ** 2001)
    state, _, report = variables_to_train_state(v, beta_1=0.5, beta_2=0.9)
    assert report["opt_d"] == "converged"
    assert report["opt_g"] == 2000
    for leaf in jax.tree_util.tree_leaves(state.opt_d.count):
        assert int(leaf) == _CONVERGED_COUNT
    # bias correction at the sentinel is exactly converged in f32
    assert np.float32(1.0 - 0.9 ** np.float32(_CONVERGED_COUNT)) == np.float32(1.0)


# ------------------------------------------------------------- EXPORT ------


def _random_state(cfg, counts=(7, 5, 3), seed=11):
    """TrainState with randomized params AND nonzero Adam moments/counts —
    zeros would make a dropped slot assignment invisible to the roundtrip."""
    from littlegan_tpu.training.optimizer import AdamState

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    rand_tree = lambda t: jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.normal(size=np.shape(l)).astype(np.float32)), t
    )
    params = rand_tree(state.params)

    def opt(template, params_sub, n):
        return AdamState(
            count=jax.tree_util.tree_map(lambda _: jnp.int32(n), params_sub),
            mu=rand_tree(template.mu),
            nu=jax.tree_util.tree_map(lambda l: jnp.abs(l), rand_tree(template.nu)),
        )

    from littlegan_tpu.training.state import A_KEYS, D_KEYS, G_KEYS, subtree

    return state._replace(
        params=params,
        opt_g=opt(state.opt_g, subtree(params, G_KEYS), counts[0]),
        opt_d=opt(state.opt_d, subtree(params, D_KEYS), counts[1]),
        opt_a=opt(state.opt_a, subtree(params, A_KEYS), counts[2]),
    )


def test_export_roundtrips_through_importer(tmp_path):
    """export -> import recovers params, moments, and apply counts
    bit-for-bit, and writes the reference's resume contract (status.json
    epoch = tag + 1, TF 'checkpoint' state file)."""
    from littlegan_tpu.compat.reference_checkpoint import export_reference_checkpoint

    pytest.importorskip("tensorflow")
    cfg = _cfg()
    state = _random_state(cfg)
    out = os.fspath(tmp_path / "refexport")
    summary = export_reference_checkpoint(
        state, out, tag="9", beta_1=cfg.beta_1, beta_2=cfg.beta_2
    )
    assert summary["optimizers"] == {"opt_g": 7, "opt_d": 5, "opt_a": 3}
    assert os.path.isfile(os.path.join(out, "checkpoint"))  # latest_checkpoint state
    with open(os.path.join(out, "status.json")) as f:
        assert json.load(f)["epoch"] == 10  # reference resumes at the NEXT epoch

    variables = read_reference_variables(out)
    state2, inferred, report = variables_to_train_state(
        variables, beta_1=cfg.beta_1, beta_2=cfg.beta_2
    )
    assert report == {"opt_g": 7, "opt_d": 5, "opt_a": 3}
    assert inferred["conv_filter"] == cfg.conv_filter
    _assert_trees_equal(state.params, state2.params)
    for field in ("opt_g", "opt_d", "opt_a"):
        _assert_trees_equal(getattr(state, field).mu, getattr(state2, field).mu)
        _assert_trees_equal(getattr(state, field).nu, getattr(state2, field).nu)


def test_export_key_schema_matches_keras_checkpoint(tmp_path):
    """The exported checkpoint's weight keys are EXACTLY what the
    reference's real keras classes serialize (same object paths, same
    sharing roots) — so its restore matches every variable, none dangling."""
    from littlegan_tpu.compat.reference_checkpoint import export_reference_checkpoint

    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    cfg = _cfg()
    p0 = _random_params(cfg)
    keras_dir = _build_keras_checkpoint(tmp_path, cfg, p0)
    keras_keys = set(read_reference_variables(keras_dir))

    state = _random_state(cfg)
    out = os.fspath(tmp_path / "refexport")
    export_reference_checkpoint(state, out, beta_1=cfg.beta_1, beta_2=cfg.beta_2)
    exported = read_reference_variables(out)
    weight_keys = {
        k for k in exported
        if "/.OPTIMIZER_SLOT/" not in k and not k.endswith(("beta1_power", "beta2_power"))
    }
    assert weight_keys == keras_keys


def test_export_restores_into_fresh_reference_graph(tmp_path):
    """Simulate the reference's own resume: a FRESH trackable graph + fresh
    v1 optimizers restore the exported checkpoint — weights land, and the
    optimizers' deferred slot restore fills m/v + beta powers on their
    first apply (exactly how eager_trainer.py:37-43 resumes training)."""
    from littlegan_tpu.compat.reference_checkpoint import (
        _build_reference_modules,
        export_reference_checkpoint,
    )

    tf = pytest.importorskip("tensorflow")
    cfg = _cfg()
    state = _random_state(cfg)
    out = os.fspath(tmp_path / "refexport")
    export_reference_checkpoint(state, out, beta_1=cfg.beta_1, beta_2=cfg.beta_2)

    zeros = jax.tree_util.tree_map(lambda l: np.zeros_like(np.asarray(l)), state.params)
    gen, disc, adj, varmap = _build_reference_modules(zeros)
    opt_g = tf.compat.v1.train.AdamOptimizer(1e-4, cfg.beta_1, cfg.beta_2)
    opt_d = tf.compat.v1.train.AdamOptimizer(1e-4, cfg.beta_1, cfg.beta_2)
    opt_a = tf.compat.v1.train.AdamOptimizer(1e-4)
    ckpt = tf.train.Checkpoint(
        discriminator=disc, generator=gen, adjuster=adj,
        discriminator_optimizer=opt_d, generator_optimizer=opt_g,
        adjuster_optimizer=opt_a,
    )
    ckpt.restore(tf.train.latest_checkpoint(out))

    got = {p: v.numpy() for p, v in varmap.items()}
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        from littlegan_tpu.utils.tree import path_str

        np.testing.assert_array_equal(got[path_str(path)], np.asarray(leaf), err_msg=path_str(path))

    # deferred optimizer restore: creating the slots (first apply) must
    # surface the exported moments, not zeros — the zero-grad probe itself
    # decays the restored m by beta_1 (m <- b1*m + (1-b1)*0), so expect that
    g_var = varmap["g_head/dense/kernel"]
    opt_g.apply_gradients([(tf.zeros_like(g_var), g_var)])
    np.testing.assert_allclose(
        opt_g.get_slot(g_var, "m").numpy(),
        cfg.beta_1 * np.asarray(state.opt_g.mu["g_head"]["dense"]["kernel"]),
        rtol=1e-6,
    )
    b1p, b2p = opt_g._get_beta_accumulators()
    # restored power beta^(7+1), then the probe apply multiplied once more
    np.testing.assert_allclose(float(b1p), cfg.beta_1 ** 9, rtol=1e-6)
    np.testing.assert_allclose(float(b2p), cfg.beta_2 ** 9, rtol=1e-6)


def test_export_script_cli(tmp_path, monkeypatch, capsys):
    """scripts/export_reference_checkpoint.py main(): cwd config, tag from
    the native checkpoint's status, --ema flag refusal-free when no EMA."""
    import importlib.util

    pytest.importorskip("tensorflow")
    cfg = _cfg(all_result_dir=os.fspath(tmp_path / "result"), exp_name="refout")
    state = _random_state(cfg)
    Checkpointer(os.path.join(cfg.result_dir, "checkpoint")).save(
        "4", state, status={"epoch": 5, "step": 12}
    )
    (tmp_path / "sample.config.json").write_text(
        json.dumps({k: getattr(cfg, k) for k in (
            "image_dim", "init_dim", "noise_dim", "attr", "conv_filter",
            "all_result_dir", "compute_dtype",
        )})
    )
    monkeypatch.chdir(tmp_path)
    spec = importlib.util.spec_from_file_location(
        "export_reference_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "export_reference_checkpoint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main(["refout"]) == 0
    out_dir = os.path.join(cfg.result_dir, "model", "reference-checkpoint")
    summary = json.loads(capsys.readouterr().out)
    assert summary["path"].startswith(out_dir)
    assert "4-1" in os.path.basename(summary["path"])  # tag = status epoch - 1
    variables = read_reference_variables(out_dir)
    params, _, _ = variables_to_params(variables)
    _assert_trees_equal(state.params, params)
