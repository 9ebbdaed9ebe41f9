"""Train-step tests: gradient routing, partition schedule, adjuster gating.

These encode the reference's trickiest semantics (SURVEY §2 #11-13):
- D-step grads touch encoder+heads; G-step grads touch g_head/decoder/out_conv;
  A-step grads touch ONLY adj_head (eager_trainer.py:59-63),
- the rotating partition schedule (eager_trainer.py:104-113),
- adjuster warm-up after batch 10 (eager_trainer.py:152),
- D-only gradient clipping (eager_trainer.py:146-148).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlegan_tpu.training import (
    build_partition_masks,
    create_train_state,
    make_train_step,
    resolve_mask,
)
from littlegan_tpu.training.step import total_loss_fn


def _batches(cfg, rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    b = cfg.batch_size
    mk = lambda k: jax.random.uniform(k, (b, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1)
    mkc = lambda k: jnp.where(jax.random.bernoulli(k, 0.5, (b, cfg.cond_dim)), 0.98, -0.94)
    return (mk(k1), mkc(k2)), (mk(k3), mkc(k4))


def _changed(a, b):
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): bool(np.any(np.asarray(x) != np.asarray(y)))
        for (path, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves_with_path(b)
        )
    }


@pytest.fixture(scope="module")
def setup(tiny_cfg):
    cfg = tiny_cfg.replace(use_partition=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, state


@pytest.mark.core
def test_gradient_routing(setup, rng):
    """Each loss's gradient reaches exactly its reference tape's params."""
    cfg, state = setup
    b1, b2 = _batches(cfg, rng)
    noise = jax.random.normal(rng, (cfg.batch_size, cfg.noise_dim))
    new_image = b1[0]
    grads, aux = jax.grad(total_loss_fn, has_aux=True)(
        state.params, b1, b2, noise, new_image, rng, cfg
    )
    for key in ("encoder", "decoder", "g_head", "out_conv", "d_head", "adj_head"):
        leaves = jax.tree_util.tree_leaves(grads[key])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), key
        # every subtree receives a nonzero gradient from its one loss
        total_mag = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total_mag > 0, f"{key} got no gradient"


@pytest.mark.core
def test_gradient_isolation_adjuster(setup, rng):
    """adj_loss alone must produce gradients ONLY in adj_head
    (reference trains only weights[16:20], eager_trainer.py:59-63)."""
    cfg, state = setup
    b1, b2 = _batches(cfg, rng)
    noise = jax.random.normal(rng, (cfg.batch_size, cfg.noise_dim))

    def adj_only(params):
        _, aux = total_loss_fn(params, b1, b2, noise, b1[0], rng, cfg)
        return aux["loss/adj"]

    grads = jax.grad(adj_only)(state.params)
    for key in ("encoder", "decoder", "g_head", "out_conv", "d_head"):
        for l in jax.tree_util.tree_leaves(grads[key]):
            np.testing.assert_array_equal(np.asarray(l), 0.0)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads["adj_head"])) > 0


@pytest.mark.core
def test_gradient_isolation_gen_vs_disc(setup, rng):
    """gen_loss -> G subtrees only; disc_loss -> D subtrees only."""
    cfg, state = setup
    b1, b2 = _batches(cfg, rng)
    noise = jax.random.normal(rng, (cfg.batch_size, cfg.noise_dim))

    def pick(params, which):
        _, aux = total_loss_fn(params, b1, b2, noise, b1[0], rng, cfg)
        return aux[which]

    g_grads = jax.grad(lambda p: pick(p, "loss/gen"))(state.params)
    for key in ("encoder", "d_head", "adj_head"):
        for l in jax.tree_util.tree_leaves(g_grads[key]):
            np.testing.assert_array_equal(np.asarray(l), 0.0)

    d_grads = jax.grad(lambda p: pick(p, "loss/disc"))(state.params)
    for key in ("g_head", "decoder", "out_conv", "adj_head"):
        for l in jax.tree_util.tree_leaves(d_grads[key]):
            np.testing.assert_array_equal(np.asarray(l), 0.0)


def test_step_updates_all_when_unpartitioned(setup, rng):
    cfg, state = setup
    step = make_train_step(cfg, state.params, donate=False)
    b1, b2 = _batches(cfg, rng)
    out = step(state, b1, b2, rng, jnp.int32(50))
    changed = _changed(state.params, out.state.params)
    assert all(changed.values()), [k for k, v in changed.items() if not v]
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert np.isfinite(float(out.metrics[k]))
    assert out.fake_image.shape == (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)
    assert out.adj_image.shape == (2 * cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)


@pytest.mark.core
def test_adjuster_warmup_gate(setup, rng):
    """batch_no <= 10: adj_head must NOT move (eager_trainer.py:152)."""
    cfg, state = setup
    step = make_train_step(cfg, state.params, donate=False)
    b1, b2 = _batches(cfg, rng)
    out = step(state, b1, b2, rng, jnp.int32(5))
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(state.params["adj_head"]),
        jax.tree_util.tree_leaves(out.state.params["adj_head"]),
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # and the adjuster Adam state is untouched too
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(state.opt_a), jax.tree_util.tree_leaves(out.state.opt_a)
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # but G/D moved
    assert any(_changed(state.params["encoder"], out.state.params["encoder"]).values())


@pytest.mark.core
def test_partition_schedule_masks(tiny_cfg):
    """Mask resolution reproduces eager_trainer.py:104-113 arithmetic."""
    cfg = tiny_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    masks = build_partition_masks(state.params)

    # every leaf belongs to exactly one group
    for model in ("generator", "discriminator", "adjuster"):
        for leaf in jax.tree_util.tree_leaves(masks[model]):
            assert float(jnp.sum(leaf)) == 1.0

    interval = 4  # period 5
    # batch 5: group (5//5) % 3 = 1 -> G trains decoder.block1 only
    m = resolve_mask(masks["generator"], jnp.int32(5), True, interval)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): float(v)
        for path, v in jax.tree_util.tree_leaves_with_path(m)
    }
    assert all(v == 1.0 for k, v in flat.items() if k.startswith("decoder/block1"))
    assert all(v == 0.0 for k, v in flat.items() if not k.startswith("decoder/block1"))

    # batch 10: group 2 -> decoder blocks 2-4 + out_conv
    m = resolve_mask(masks["generator"], jnp.int32(10), True, interval)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): float(v)
        for path, v in jax.tree_util.tree_leaves_with_path(m)
    }
    assert all(v == 0.0 for k, v in flat.items() if k.startswith("g_head") or k.startswith("decoder/block1"))
    assert all(v == 1.0 for k, v in flat.items() if k.startswith("out_conv"))

    # batch 7 (not a multiple of 5): everything trains
    m = resolve_mask(masks["generator"], jnp.int32(7), True, interval)
    assert all(float(v) == 1.0 for v in jax.tree_util.tree_leaves(m))

    # use_partition=False: always all
    m = resolve_mask(masks["discriminator"], jnp.int32(5), False, interval)
    assert all(float(v) == 1.0 for v in jax.tree_util.tree_leaves(m))


@pytest.mark.core
def test_partitioned_step_only_updates_group(tiny_cfg, rng):
    """1-step integration: on a partition batch only the scheduled subtree
    changes (SURVEY §4's required partition-semantics test)."""
    cfg = tiny_cfg.replace(use_partition=True, partition_interval=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)
    b1, b2 = _batches(cfg, rng)
    # batch 15: period 5, group (15//5)%3 = 0 -> G: g_head, D: encoder.block1-3
    out = step(state, b1, b2, rng, jnp.int32(15))
    changed = _changed(state.params, out.state.params)
    for k, v in changed.items():
        if k.startswith("g_head") or any(k.startswith(f"encoder/block{i}") for i in (1, 2, 3)):
            assert v, f"{k} should have changed"
        elif k.startswith("adj_head"):
            assert v, "adjuster trains its (single) group on partition batches"
        else:
            assert not v, f"{k} should NOT have changed"


@pytest.mark.core
def test_masked_adam_matches_unmasked_adam(rng):
    """mask=1 must reproduce textbook TF-v1 Adam exactly."""
    from littlegan_tpu.training.optimizer import adam_init, masked_adam_update

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32))}
    grads = {"w": jnp.asarray(np.random.default_rng(1).normal(size=(4, 4)).astype(np.float32))}
    st = adam_init(params)
    ones = {"w": jnp.float32(1.0)}
    p1, st1 = masked_adam_update(grads, st, params, ones, lr=0.1, b1=0.5, b2=0.9)

    g = np.asarray(grads["w"])
    m = 0.5 * g  # (1-b1)*g
    v = 0.1 * g**2
    lr_t = 0.1 * np.sqrt(1 - 0.9) / (1 - 0.5)
    want = np.asarray(params["w"]) - lr_t * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(p1["w"]), want, rtol=1e-5)

    # mask=0: nothing moves
    zeros = {"w": jnp.float32(0.0)}
    p0, st0 = masked_adam_update(grads, st, params, zeros, lr=0.1, b1=0.5, b2=0.9)
    np.testing.assert_array_equal(np.asarray(p0["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(st0.mu["w"]), 0.0)
    assert int(st0.count["w"]) == 0


def test_gp_enabled_runs(tiny_cfg, rng):
    """The reference stubs GP with NotImplementedError (eager_trainer.py:141-143);
    we actually implement it — enabling it must produce a finite loss."""
    cfg = tiny_cfg.replace(use_gp=True, use_partition=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)
    b1, b2 = _batches(cfg, rng)
    out = step(state, b1, b2, rng, jnp.int32(1))
    assert np.isfinite(float(out.metrics["loss/disc"]))


def test_gp_enabled_runs_bf16(tiny_cfg, rng):
    """GP x bf16 compute: the penalty differentiates the D forward to SECOND
    order (grad-of-grad on interpolates), so every op on that path must stay
    jvp-able — any custom_vjp introduced into the bf16 norm/conv path without
    a use_gp gate breaks exactly this composition (measured dead end,
    ROADMAP #3: XLA already keeps the backward stat reductions bf16)."""
    cfg = tiny_cfg.replace(use_gp=True, use_partition=False, compute_dtype="bfloat16")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)
    b1, b2 = _batches(cfg, rng)
    out = step(state, b1, b2, rng, jnp.int32(1))
    assert np.isfinite(float(out.metrics["loss/disc"]))


def test_train_adj_disabled(tiny_cfg, rng):
    """train_adj=False: adjuster params never move, no adj loss in metrics
    (reference gates the whole branch, eager_trainer.py:152)."""
    cfg = tiny_cfg.replace(train_adj=False, use_partition=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)
    b1, b2 = _batches(cfg, rng)
    out = step(state, b1, b2, rng, jnp.int32(50))
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(state.params["adj_head"]),
        jax.tree_util.tree_leaves(out.state.params["adj_head"]),
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert float(out.metrics["loss/adj"]) == 0.0
    # G and D still train
    assert np.any(
        np.asarray(out.state.params["g_head"]["dense"]["kernel"])
        != np.asarray(state.params["g_head"]["dense"]["kernel"])
    )


def test_higher_resolution_config(rng):
    """The architecture generalizes to 2x resolution via init_dim scaling
    (SURVEY §5: resolution is the analogous scaling axis)."""
    from littlegan_tpu.config import Config
    from littlegan_tpu.models import generator_apply, discriminator_apply, init_params

    cfg = Config(
        batch_size=2, image_dim=32, init_dim=2, noise_dim=9,
        attr=[0, 1, 2], conv_filter=[12, 8, 6, 4, 4],
        compute_dtype="float32", debug=True,
    )
    p = init_params(cfg, rng)
    img = generator_apply(p, jax.random.normal(rng, (2, 9)), jnp.zeros((2, 3)), cfg)
    assert img.shape == (2, 32, 32, 3)
    pr, c = discriminator_apply(p, img, cfg)
    assert pr.shape == (2, 1) and c.shape == (2, 3)


@pytest.mark.core
def test_adam_tf_parity_matches_v1_simulation():
    """tick_all=True must reproduce TF v1 Adam EXACTLY under a rotating
    partition mask: v1 ticks its shared beta-power pair on every
    apply_gradients call, even for weights the schedule excluded (ADVICE r1)."""
    from littlegan_tpu.training.optimizer import adam_init, masked_adam_update

    lr, b1, b2, eps = 5e-5, 0.5, 0.9, 1e-8
    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(2,)), jnp.float32)}
    grads_seq = [
        {"a": rng.normal(size=(3,)).astype(np.float32),
         "b": rng.normal(size=(2,)).astype(np.float32)}
        for _ in range(6)
    ]
    masks_seq = [{"a": 1.0, "b": 0.0}, {"a": 0.0, "b": 1.0}, {"a": 1.0, "b": 1.0}] * 2

    # --- ours, parity mode ---
    st = adam_init(params)
    p = params
    for g, m in zip(grads_seq, masks_seq):
        p, st = masked_adam_update(
            {k: jnp.asarray(v) for k, v in g.items()}, st, p, m, lr, b1, b2, eps,
            tick_all=True,
        )

    # --- straight-line NumPy TF v1 Adam (shared beta powers, masked slots) ---
    ref = {k: np.asarray(v, np.float64) for k, v in params.items()}
    mom = {k: np.zeros_like(v) for k, v in ref.items()}
    vel = {k: np.zeros_like(v) for k, v in ref.items()}
    t = 0
    for g, m in zip(grads_seq, masks_seq):
        t += 1  # beta powers tick once per apply call, for every slot
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        for k in ref:
            if m[k] > 0.5:  # only selected vars get moment/param updates
                mom[k] = b1 * mom[k] + (1 - b1) * g[k]
                vel[k] = b2 * vel[k] + (1 - b2) * g[k] ** 2
                ref[k] = ref[k] - lr_t * mom[k] / (np.sqrt(vel[k]) + eps)
    for k in ref:
        np.testing.assert_allclose(np.asarray(p[k]), ref[k], rtol=1e-5, atol=1e-7, err_msg=k)


def test_adam_parity_vs_perleaf_drift_quantified():
    """Document the default (per-leaf count) vs v1-parity divergence under a
    rotating mask: bounded by the bias-correction ratio, a few percent of lr
    early on, converging as t grows."""
    from littlegan_tpu.training.optimizer import adam_init, masked_adam_update

    lr, b1, b2 = 5e-5, 0.5, 0.9
    rng = np.random.default_rng(1)
    params = {"a": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
    masks = [{"a": 0.0}, {"a": 0.0}, {"a": 1.0}]  # leaf skipped 2 of 3 steps
    grads = [{"a": jnp.asarray(rng.normal(size=(4,)), jnp.float32)} for _ in range(9)]

    outs = {}
    for tick_all in (False, True):
        p, st = params, adam_init(params)
        for i in range(9):
            p, st = masked_adam_update(grads[i], st, p, masks[i % 3], lr, b1, b2, tick_all=tick_all)
        outs[tick_all] = np.asarray(p["a"])
    diff = np.abs(outs[True] - outs[False]).max()
    assert diff > 0.0  # the schedules genuinely differ...
    assert diff < 3 * lr  # ...by at most a few update magnitudes over 3 applies


def test_bf16_tails_track_f32(tiny_cfg, rng):
    """bf16 compute mode carries image tails in bf16 (littlegan.py:_out_conv,
    step.py cast) — losses must stay within bf16 rounding of the f32 run,
    and the step's image outputs must actually BE bf16 (no silent f32
    materialization of the 2B tails)."""
    from littlegan_tpu.training import make_train_step

    b1, b2 = _batches(tiny_cfg, rng)
    noise_rng = jax.random.PRNGKey(7)
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = tiny_cfg.replace(compute_dtype=dt, use_partition=False, train_adj=True)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, state.params, donate=False)
        out = step(state, b1, b2, noise_rng, jnp.int32(11))
        outs[dt] = out
    assert outs["bfloat16"].fake_image.dtype == jnp.bfloat16
    assert outs["bfloat16"].adj_image.dtype == jnp.bfloat16
    assert outs["float32"].fake_image.dtype == jnp.float32
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        a = float(outs["float32"].metrics[k])
        b = float(outs["bfloat16"].metrics[k])
        assert np.isfinite(b)
        assert abs(a - b) < 0.05 * max(1.0, abs(a)), (k, a, b)


def test_bf16_moments_track_f32(tiny_cfg, rng):
    """Config.moment_dtype='bfloat16': mu/nu STORED in bf16 (half the
    optimizer-state HBM), update math still f32. Three steps must track the
    f32-moment run within a few Adam-step magnitudes, the moments must
    actually be bf16 end to end, and an npz checkpoint round trip must be
    bit-exact (V2 void reinterpretation in checkpoint._unflatten)."""
    from littlegan_tpu.training import make_train_step
    from littlegan_tpu.training.checkpoint import Checkpointer

    b1, b2 = _batches(tiny_cfg, rng)
    states = {}
    for dt in ("float32", "bfloat16"):
        cfg = tiny_cfg.replace(moment_dtype=dt, use_partition=True, train_adj=True)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, state.params, donate=False)
        for i, bno in enumerate((9, 10, 11, 12)):  # crosses the adj gate
            state = step(state, b1, b2, jax.random.PRNGKey(50 + i), jnp.int32(bno)).state
        states[dt] = state
    bf = states["bfloat16"]
    assert bf.opt_g.mu["g_head"]["dense"]["kernel"].dtype == jnp.bfloat16
    assert bf.opt_a.nu["adj_head"]["dense"]["kernel"].dtype == jnp.bfloat16
    assert bf.params["g_head"]["dense"]["kernel"].dtype == jnp.float32  # params untouched
    # bounded drift: bf16 moment rounding perturbs m/sqrt(v) by O(2^-8)
    # per step; after 4 steps the params stay within a few update magnitudes
    max_step = 4 * 2.5 * tiny_cfg.lr
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(states["float32"].params),
        jax.tree_util.tree_leaves_with_path(bf.params),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= max_step, f"{key}: bf16-moment drift {diff} > {max_step}"

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ck = Checkpointer(d)
        ck.save("1", bf)
        restored = ck.restore("1", bf)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_leaves_with_path(bf),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        assert np.asarray(y).dtype == np.asarray(x).dtype
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_moment_dtype_validated(tiny_cfg):
    with pytest.raises(ValueError, match="moment_dtype"):
        create_train_state(tiny_cfg.replace(moment_dtype="float16"), jax.random.PRNGKey(0))


def test_accum_grads_mean_micro_grads(tiny_cfg, rng):
    """accum_grads must return the MEAN of the per-micro-batch gradients
    (same fold_in PRNG stream) and the LAST micro-step's aux. Gradients are
    compared directly — Adam's normalized update is sign-unstable for
    near-cancelling mean grads, so param-space comparison would flake."""
    from littlegan_tpu.training.step import _micro_grads, accum_grads

    cfg = tiny_cfg.replace(use_partition=False, train_adj=True, grad_accum=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    m = 2
    pairs = [_batches(cfg, jax.random.fold_in(rng, 100 + i)) for i in range(m)]
    b1s = tuple(jnp.stack([p[0][j] for p in pairs]) for j in range(2))
    b2s = tuple(jnp.stack([p[1][j] for p in pairs]) for j in range(2))
    base_rng = jax.random.PRNGKey(5)

    from functools import partial

    grads, aux = jax.jit(partial(accum_grads, cfg=cfg))(state, b1s, b2s, base_rng)

    acc = None
    for i in range(m):
        g, aux_i = _micro_grads(
            state, pairs[i][0], pairs[i][1], jax.random.fold_in(base_rng, i), cfg, False
        )
        g = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), g)
        acc = g if acc is None else jax.tree_util.tree_map(np.add, acc, g)
    mean = jax.tree_util.tree_map(lambda x: x / m, acc)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(grads),
        jax.tree_util.tree_leaves_with_path(mean),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=str(path)
        )
    # aux is the last micro-step's
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        np.testing.assert_allclose(float(aux[k]), float(aux_i[k]), rtol=1e-5)


def test_ema_tracks_generator_closed_form(tiny_cfg, rng):
    """Config.ema_decay: state.ema follows e' = d*e + (1-d)*p_new over the G
    subtrees after every applied update; decay=0 keeps the historical pytree
    (ema is None)."""
    import jax

    from littlegan_tpu.training import create_train_state, make_train_step
    from littlegan_tpu.training.state import G_KEYS, subtree

    cfg = tiny_cfg.replace(use_partition=False, train_adj=True, ema_decay=0.5, donate_state=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    assert state.ema is not None
    # off: structure unchanged
    off = create_train_state(cfg.replace(ema_decay=0.0), jax.random.PRNGKey(0))
    assert off.ema is None

    step = make_train_step(cfg, state.params, donate=False)
    mk = lambda k: (
        jax.random.uniform(k, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1),
        jnp.where(jax.random.bernoulli(k, 0.5, (cfg.batch_size, cfg.cond_dim)), 0.98, -0.94),
    )
    ks = jax.random.split(rng, 4)
    expect = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), subtree(state.params, G_KEYS))
    for i in range(2):
        out = step(state, mk(ks[2 * i]), mk(ks[2 * i + 1]), ks[i], jnp.int32(20 + i))
        state = out.state
        expect = jax.tree_util.tree_map(
            lambda e, p: 0.5 * e + 0.5 * np.asarray(p, np.float64),
            expect,
            subtree(state.params, G_KEYS),
        )
    for (path, e), (_, got) in zip(
        jax.tree_util.tree_leaves_with_path(expect),
        jax.tree_util.tree_leaves_with_path(state.ema),
    ):
        key = "/".join(str(getattr(q, "key", q)) for q in path)
        np.testing.assert_allclose(np.asarray(got), e, rtol=1e-5, atol=1e-6, err_msg=key)
    # non-G subtrees are not tracked
    assert set(state.ema) == set(G_KEYS)


def test_ema_scan_matches_sequential(tiny_cfg):
    """EMA rides the scan carry: K=2 scanned steps produce the same ema as 2
    sequential store-slicing steps."""
    import jax

    from littlegan_tpu.training import create_train_state
    from littlegan_tpu.training.step import make_gather_train_step, make_scan_train_step

    cfg = tiny_cfg.replace(use_partition=True, train_adj=True, ema_decay=0.9, donate_state=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    imgs = jnp.stack([
        jax.random.uniform(k1, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1)
        for _ in range(4)
    ])
    conds = jnp.stack([
        jnp.where(jax.random.bernoulli(jax.random.fold_in(k2, i), 0.5, (cfg.batch_size, cfg.cond_dim)), 0.98, -0.94)
        for i in range(4)
    ])
    base_rng = jax.random.PRNGKey(11)

    gather = make_gather_train_step(cfg, state.params, donate=False)
    seq = state
    for i in range(2):
        rng_i = jax.random.fold_in(base_rng, i)
        seq = gather(seq, imgs, conds, jnp.int32(i), jnp.int32(i + 2), rng_i, jnp.int32(11 + i)).state

    scan = make_scan_train_step(cfg, state.params, 2, donate=False)
    b1s = jnp.arange(2, dtype=jnp.int32)
    out = scan(state, imgs, conds, b1s, b1s + 2, base_rng, jnp.int32(0), jnp.int32(11))

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(seq.ema),
        jax.tree_util.tree_leaves_with_path(out.state.ema),
    ):
        key = "/".join(str(getattr(q, "key", q)) for q in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=key)


def test_ema_composes_with_donated_state(tiny_cfg, rng):
    """ema must be a COPY of the init params, not an alias: aliased Arrays
    appear twice in a donated TrainState and XLA rejects donating the same
    buffer twice (review finding, repro'd). Also: ema_decay >= 1 is refused."""
    import jax

    from littlegan_tpu.training import create_train_state, make_train_step

    cfg = tiny_cfg.replace(use_partition=False, train_adj=True, ema_decay=0.9, donate_state=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=True)
    mk = lambda k: (
        jax.random.uniform(k, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1),
        jnp.where(jax.random.bernoulli(k, 0.5, (cfg.batch_size, cfg.cond_dim)), 0.98, -0.94),
    )
    k1, k2 = jax.random.split(rng)
    out = step(state, mk(k1), mk(k2), rng, jnp.int32(20))  # must not raise
    assert out.state.ema is not None

    with pytest.raises(ValueError, match="ema_decay"):
        create_train_state(tiny_cfg.replace(ema_decay=1.0), jax.random.PRNGKey(0))


def test_scan_step_donation_matches_undonated(tiny_cfg):
    """The device-store scan path honors cfg.donate_state (donate=None):
    donation aliases the output state onto the input (~2.3 GB of peak HBM
    at 1024² — the r3_1024 campaign OOM's 'Output shares 0B with
    arguments') and must be bit-identical to the un-donated dispatch."""
    from littlegan_tpu.training.step import make_scan_train_step

    outs = {}
    for donate in (False, True):
        cfg = tiny_cfg.replace(device_data=True, steps_per_dispatch=2, donate_state=donate)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_scan_train_step(cfg, state.params, 2)  # donate=None -> cfg
        r = np.random.RandomState(0)
        imgs = jnp.asarray(r.uniform(-1, 1, (4, cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)).astype(np.float32))
        conds = jnp.asarray(np.where(r.rand(4, cfg.batch_size, cfg.cond_dim) < 0.5, 0.98, -0.94).astype(np.float32))
        out = step(
            state, imgs, conds,
            jnp.asarray([0, 2], jnp.int32), jnp.asarray([1, 3], jnp.int32),
            jax.random.PRNGKey(7), jnp.int32(1), jnp.int32(1),
        )
        outs[donate] = jax.tree.map(np.asarray, (out.metrics, out.state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), outs[False], outs[True]
    )


def test_accum_dp_mesh_divisibility_validated(tiny_cfg):
    """A pure-DP mesh with a non-divisible batch must be a clear build-time
    ValueError in make_accum_train_step, not an opaque GSPMD dispatch error
    (the spatial branch already validated; this pins the DP branch)."""
    from littlegan_tpu.parallel import make_mesh
    from littlegan_tpu.training.step import make_accum_train_step

    cfg = tiny_cfg.replace(batch_size=6, grad_accum=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible by the data-axis"):
        make_accum_train_step(cfg, state.params, donate=False, mesh=make_mesh(4))


def test_store_s2d_requires_active_s2d(tiny_cfg):
    """store_s2d=True with the s2d step inactive (use_s2d off, or a 'model'
    mesh block space cannot tile) must fail at build time with the RAW-store
    remediation — the silent former behavior fed 12-channel block images to
    the raw model and died in an opaque conv shape error at trace time.
    Round-4 update: a COMPATIBLE spatial mesh keeps s2d active
    (spatial_s2d_compatible), so an s2d store now BUILDS there."""
    from littlegan_tpu.parallel import make_mesh
    from littlegan_tpu.training.step import (
        make_gather_train_step,
        make_scan_accum_train_step,
        make_scan_train_step,
    )

    cfg = tiny_cfg.replace(use_s2d=True, device_data=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # s2d inactive via the flag (the mesh-driven disable needs a model axis
    # >= 16 for any 16-multiple image — spatial_s2d_compatible's truth table
    # is unit-tested in tests/test_spatial.py); the s2d store must refuse
    smesh4 = make_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    off = cfg.replace(use_s2d=False)
    for build in (
        lambda: make_scan_train_step(off, state.params, 2, donate=False, mesh=smesh4, store_s2d=True),
        lambda: make_scan_accum_train_step(
            off.replace(grad_accum=2), state.params, 2, donate=False, mesh=smesh4, store_s2d=True
        ),
        lambda: make_gather_train_step(off, state.params, donate=False, mesh=smesh4, store_s2d=True),
        lambda: make_gather_train_step(off, state.params, donate=False, store_s2d=True),
    ):
        with pytest.raises(ValueError, match="RAW-layout"):
            build()
    # a COMPATIBLE mesh (block space 8 tiles model=2) keeps s2d: both the
    # s2d store and the raw store build
    smesh2 = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    make_scan_train_step(cfg, state.params, 2, donate=False, mesh=smesh2, store_s2d=True)
    make_scan_train_step(cfg, state.params, 2, donate=False, mesh=smesh2, store_s2d=False)


def test_lr_schedule_factory_goldens():
    """lr_scale_fn anchors: identity -> None; warmup ramp; linear/cosine/
    exponential endpoints and floors; validation errors."""
    import numpy as np

    from littlegan_tpu.training.optimizer import lr_scale_fn

    assert lr_scale_fn("constant") is None  # default path stays bit-identical

    warm = lr_scale_fn("constant", warmup_steps=4)
    np.testing.assert_allclose([warm(t) for t in (1.0, 2.0, 4.0, 9.0)], [0.25, 0.5, 1.0, 1.0])

    lin = lr_scale_fn("linear", decay_steps=10, min_ratio=0.1)
    np.testing.assert_allclose(lin(1.0), 1.0 - 0.9 * 0.1, rtol=1e-6)
    np.testing.assert_allclose(lin(10.0), 0.1, rtol=1e-6)
    np.testing.assert_allclose(lin(99.0), 0.1, rtol=1e-6)  # holds the floor

    cos = lr_scale_fn("cosine", warmup_steps=2, decay_steps=8, min_ratio=0.0)
    np.testing.assert_allclose(cos(1.0), 0.5, rtol=1e-6)  # mid-warmup
    np.testing.assert_allclose(cos(2.0), 1.0, rtol=1e-6)  # warmup done, p=0
    np.testing.assert_allclose(cos(6.0), 0.5, rtol=1e-6)  # p=1/2
    np.testing.assert_allclose(cos(10.0), 0.0, atol=1e-7)  # p=1
    np.testing.assert_allclose(cos(50.0), 0.0, atol=1e-7)

    exp = lr_scale_fn("exponential", decay_steps=10, min_ratio=0.01)
    np.testing.assert_allclose(exp(5.0), 0.1, rtol=1e-5)  # geometric midpoint
    np.testing.assert_allclose(exp(10.0), 0.01, rtol=1e-5)
    np.testing.assert_allclose(exp(25.0), 0.01, rtol=1e-5)

    with pytest.raises(ValueError, match="one of"):
        lr_scale_fn("step")
    with pytest.raises(ValueError, match="does nothing"):
        lr_scale_fn("cosine")  # no horizon at all
    with pytest.raises(ValueError, match="min_ratio > 0"):
        lr_scale_fn("exponential", decay_steps=10, min_ratio=0.0)
    with pytest.raises(ValueError, match="0, 1"):
        lr_scale_fn("linear", decay_steps=10, min_ratio=1.5)


def test_lr_schedule_scales_adam_step_exactly():
    """The schedule multiplies lr_t and nothing else: each scheduled apply's
    param delta equals the constant-lr delta times scale(t), with identical
    moments/counts; masked-off leaves stay untouched."""
    import numpy as np

    from littlegan_tpu.training.optimizer import adam_init, lr_scale_fn, masked_adam_update

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}
    scale = lr_scale_fn("linear", warmup_steps=2, decay_steps=4, min_ratio=0.25)
    ones = {"w": jnp.float32(1.0)}

    p_sched, st_sched = params, adam_init(params)
    p_const, st_const = params, adam_init(params)
    for t in range(1, 7):
        g = {"w": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}
        new_sched, st_sched = masked_adam_update(
            g, st_sched, p_sched, ones, lr=0.1, b1=0.5, b2=0.9, lr_scale=scale
        )
        new_const, st_const = masked_adam_update(
            g, st_const, p_const, ones, lr=0.1, b1=0.5, b2=0.9
        )
        # moments depend only on grads -> identical; deltas scale by scale(t)
        np.testing.assert_allclose(st_sched.mu["w"], st_const.mu["w"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_sched["w"] - p_sched["w"]),
            float(scale(float(t))) * np.asarray(new_const["w"] - p_const["w"]),
            rtol=2e-5, atol=1e-8,
        )
        # from here the trajectories diverge; step both forward independently
        p_sched, p_const = new_sched, new_const

    # masked-off leaf: schedule must not touch it either
    zeros = {"w": jnp.float32(0.0)}
    frozen, st_frozen = masked_adam_update(
        {"w": jnp.ones(5, jnp.float32)}, adam_init(params), params, zeros,
        lr=0.1, b1=0.5, b2=0.9, lr_scale=scale,
    )
    np.testing.assert_array_equal(frozen["w"], params["w"])
    assert int(st_frozen.count["w"]) == 0


def test_lr_schedule_through_train_step(tiny_cfg, rng):
    """Config wiring: a decayed-to-floor schedule produces smaller param
    movement than the constant default on the SAME inputs, and the default
    config resolves to the identity (None)."""
    from littlegan_tpu.training.optimizer import lr_scale_from_config

    assert lr_scale_from_config(tiny_cfg) is None

    sched_cfg = tiny_cfg.replace(
        lr_schedule="linear", lr_decay_steps=1, lr_min_ratio=0.1,
        use_partition=False, train_adj=False,
    )
    const_cfg = tiny_cfg.replace(use_partition=False, train_adj=False)
    b1, b2 = _batches(tiny_cfg, rng)

    deltas = {}
    for name, cfg in (("sched", sched_cfg), ("const", const_cfg)):
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, state.params, donate=False)
        out = step(state, b1, b2, rng, jnp.int32(50))
        deltas[name] = float(
            sum(
                jnp.abs(b.astype(jnp.float32) - a.astype(jnp.float32)).sum()
                for a, b in zip(
                    jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(out.state.params),
                )
            )
        )
    # first apply: t=1 -> schedule already at the 0.1 floor
    assert deltas["sched"] < 0.5 * deltas["const"]
    assert np.isfinite(deltas["sched"]) and deltas["sched"] > 0


# ---------------------------------------------------- adj_half_batch mode ----


def test_adj_half_batch_task_exactness(setup, rng):
    """cfg.adj_half_batch: even steps run EXACTLY the reference's real-image
    adjuster row (img1 -> img2 targets, cond2), odd steps exactly the
    generated-image row (fake -> img1, cond1) — verified by computing each
    task's loss manually through the same apply fns."""
    import jax.numpy as jnp

    from littlegan_tpu.models import adjuster_apply, discriminator_apply, generator_apply
    from littlegan_tpu.ops.losses import adjuster_loss

    cfg, state = setup
    hcfg = cfg.replace(adj_half_batch=True)
    b1, b2 = _batches(cfg, rng)
    noise = jax.random.normal(rng, (cfg.batch_size, cfg.noise_dim))
    params = state.params
    (img1, cond1), (img2, cond2) = b1, b2
    fake = generator_apply(params, noise, cond2, cfg)

    def manual(in_img, tgt_cond, tgt_img):
        out = adjuster_apply(params, in_img, (tgt_cond + 1.0) * 0.5, cfg)
        pr, c = discriminator_apply(params, out, cfg)
        return adjuster_loss(tgt_cond, c, pr, tgt_img, out, cfg.l1_lambda)

    for sel, (in_img, tc, ti) in (
        (0, (img1, cond2, img2)),
        (1, (np.asarray(fake), cond1, img1)),
    ):
        _, aux = total_loss_fn(
            params, b1, b2, noise, b1[0], rng, hcfg, False, jnp.int32(sel)
        )
        np.testing.assert_allclose(
            np.asarray(aux["loss/adj"]), np.asarray(manual(in_img, tc, ti)),
            rtol=2e-5, err_msg=f"sel={sel}",
        )
        assert aux["adj"].shape[0] == cfg.batch_size  # N rows, not 2N
    # flag off: bitwise-unchanged reference math (2N concat)
    _, aux_ref = total_loss_fn(params, b1, b2, noise, b1[0], rng, cfg)
    assert aux_ref["adj"].shape[0] == 2 * cfg.batch_size


def test_adj_half_batch_trains_through_all_dispatch_paths(tiny_cfg, tmp_path):
    """adj_half_batch compiles and trains through the plain jit, the K-step
    scan (device_data), and gradient accumulation — one traced program
    handles both parities — and the adjuster still learns (params change
    after the warm-up gate)."""
    import jax.numpy as jnp

    from littlegan_tpu.training.step import (
        make_accum_train_step,
        make_scan_train_step,
        make_train_step,
    )

    cfg = tiny_cfg.replace(adj_half_batch=True, use_partition=False, donate_state=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    b1, b2 = _batches(cfg, rng)
    step = make_train_step(cfg, state.params)
    before = jax.device_get(state.params["adj_head"])
    out = step(state, b1, b2, rng, jnp.int32(11))   # even, past warm-up
    out = step(out.state, b2, b1, rng, jnp.int32(12))  # odd
    assert all(np.isfinite(np.asarray(v)).all() for v in out.metrics.values())
    after = jax.device_get(out.state.params["adj_head"])
    assert any(
        np.any(np.asarray(a) != np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after))
    )

    # scan path: K=2 steps per dispatch over a 4-batch store
    store_img = jnp.stack([b1[0], b2[0], b1[0], b2[0]])
    store_cond = jnp.stack([b1[1], b2[1], b1[1], b2[1]])
    scan = make_scan_train_step(cfg, state.params, 2)
    sout = scan(
        state, store_img, store_cond,
        jnp.array([0, 1], jnp.int32), jnp.array([2, 3], jnp.int32),
        rng, jnp.int32(0), jnp.int32(11),
    )
    assert sout.metrics["loss/adj"].shape == (2,)
    assert np.isfinite(np.asarray(sout.metrics["loss/adj"])).all()

    # accumulation path: M=2 micro-pairs, one apply
    acc = make_accum_train_step(cfg.replace(grad_accum=2), state.params)
    b1s = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), b1, b2)
    b2s = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), b2, b1)
    aout = acc(state, b1s, b2s, rng, jnp.int32(11))
    assert np.isfinite(np.asarray(aout.metrics["loss/adj"])).all()


def test_remat_step_equivalence(tiny_cfg, rng):
    """Config.remat replays each network application's forward inside its
    own backward segment (jax.checkpoint in step.py::total_loss_fn) — the
    same ops, so the step must match the stored-activation step to f32
    rounding: losses AND every updated parameter across a 3-step trajectory
    (partition schedule on, s2d boundary on). Tolerances allow the fusion-
    order rounding drift the replayed forwards introduce, amplified through
    Adam's sqrt(nu) normalization (observed max ~4e-5 relative after 3
    steps); a wrong-gradient bug is orders of magnitude larger."""
    b1, b2 = _batches(tiny_cfg, rng)
    results = {}
    for remat in (False, True):
        cfg = tiny_cfg.replace(remat=remat, use_partition=True, train_adj=True)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, state.params, donate=False)
        out = None
        for i, bno in enumerate((10, 11, 12)):
            out = step(state, b1, b2, jax.random.PRNGKey(60 + i), jnp.int32(bno))
            state = out.state
        results[remat] = (state, out.metrics)
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        np.testing.assert_allclose(
            float(results[False][1][k]), float(results[True][1][k]), rtol=1e-4, err_msg=k
        )
    base = jax.tree_util.tree_leaves_with_path(results[False][0].params)
    rem = jax.tree_util.tree_leaves_with_path(results[True][0].params)
    for (path, xa), (_, xb) in zip(base, rem):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_remat_composes_with_gp_and_bf16(tiny_cfg, rng):
    """remat must compose with the gradient penalty (grad-of-grad THROUGH
    jax.checkpoint) and bf16 compute: the step runs, losses stay finite and
    within bf16 rounding of the unremat bf16 step."""
    b1, b2 = _batches(tiny_cfg, rng)
    vals = {}
    for remat in (False, True):
        cfg = tiny_cfg.replace(
            remat=remat, use_gp=True, use_partition=False, compute_dtype="bfloat16"
        )
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, state.params, donate=False)
        out = step(state, b1, b2, jax.random.PRNGKey(5), jnp.int32(11))
        vals[remat] = {k: float(out.metrics[k]) for k in ("loss/gen", "loss/disc", "loss/adj")}
    for k, a in vals[False].items():
        b = vals[True][k]
        assert np.isfinite(b), k
        assert abs(a - b) < 0.05 * max(1.0, abs(a)), (k, a, b)
