"""Experiment: alternate train-step formulations benchmarked on the chip.

Variant B batches the two live-params D forwards (augmented real + sg(fake))
into ONE 2B call — fewer kernel launches, bigger MXU batches — at the cost
of defeating any CSE between D(sg(fake)) and the frozen-params D(fake).
Run: python scripts/bench_step_variants.py
"""

import functools
import time

import jax
import jax.numpy as jnp

from littlegan_tpu.config import Config
from littlegan_tpu.models import adjuster_apply, discriminator_apply, generator_apply
from littlegan_tpu.ops.augment import augment
from littlegan_tpu.ops.losses import adjuster_loss, discriminator_loss, generator_loss
from littlegan_tpu.training import create_train_state
from littlegan_tpu.training.optimizer import masked_adam_update
from littlegan_tpu.training.partition import build_partition_masks, resolve_mask
from littlegan_tpu.training.state import A_KEYS, D_KEYS, G_KEYS, TrainState, subtree
from littlegan_tpu.training.step import StepOutput, _freeze, make_train_step
from bench import make_batch

cfg = Config(batch_size=32, compute_dtype="bfloat16", donate_state=True, debug=True)


def total_loss_concat(params, batch1, batch2, noise, new_image, cfg):
    sg = jax.lax.stop_gradient
    img1, cond1 = batch1
    img2, cond2 = batch2
    fake = generator_apply(params, noise, cond2, cfg)
    both = jnp.concatenate([new_image, sg(fake)], axis=0)
    pr, c = discriminator_apply(params, both, cfg)
    real_pr, fake_pr_d = pr[: cfg.batch_size], pr[cfg.batch_size :]
    real_c = c[: cfg.batch_size]
    d_loss = discriminator_loss(cond1, real_c, real_pr, fake_pr_d)
    d_frozen = _freeze(params, G_KEYS)
    fake_pr_g, fake_c_g = discriminator_apply(d_frozen, fake, cfg)
    g_loss = generator_loss(cond2, fake_c_g, fake_pr_g, img2, fake, cfg.l1_lambda)
    total = g_loss + d_loss
    adj_in_cond = (jnp.concatenate([cond2, cond1], 0) + 1.0) * 0.5
    adj_tgt_cond = jnp.concatenate([cond2, cond1], 0)
    adj_in_img = jnp.concatenate([img1, sg(fake)], 0)
    adj_tgt_img = jnp.concatenate([img2, img1], 0)
    adj_image = adjuster_apply(_freeze(params, A_KEYS), adj_in_img, adj_in_cond, cfg)
    adj_pr, adj_c = discriminator_apply(_freeze(params, ()), adj_image, cfg)
    a_loss = adjuster_loss(adj_tgt_cond, adj_c, adj_pr, adj_tgt_img, adj_image, cfg.l1_lambda)
    total = total + a_loss
    return total, {"loss/gen": g_loss, "loss/disc": d_loss, "loss/adj": a_loss, "fake": fake, "adj": adj_image}


def step_concat(state, b1, b2, rng, batch_no, part_masks):
    kn, ka, _ = jax.random.split(rng, 3)
    img1, _ = b1
    noise = jax.random.normal(kn, (img1.shape[0], cfg.noise_dim), jnp.float32)
    new_image = augment(ka, img1)
    grads, aux = jax.grad(total_loss_concat, has_aux=True)(state.params, b1, b2, noise, new_image, cfg)
    d_grads = jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -cfg.clip_range, cfg.clip_range), subtree(grads, D_KEYS)
    )
    g_mask = resolve_mask(part_masks["generator"], batch_no, True, cfg.partition_interval)
    d_mask = resolve_mask(part_masks["discriminator"], batch_no, True, cfg.partition_interval)
    a_mask = resolve_mask(part_masks["adjuster"], batch_no, True, cfg.partition_interval)
    adj_gate = (batch_no > 10).astype(jnp.float32)
    a_mask = jax.tree_util.tree_map(lambda m: m * adj_gate, a_mask)
    new_g, og = masked_adam_update(subtree(grads, G_KEYS), state.opt_g, subtree(state.params, G_KEYS), g_mask, cfg.lr, cfg.beta_1, cfg.beta_2)
    new_d, od = masked_adam_update(d_grads, state.opt_d, subtree(state.params, D_KEYS), d_mask, cfg.lr, cfg.beta_1, cfg.beta_2)
    new_a, oa = masked_adam_update(subtree(grads, A_KEYS), state.opt_a, subtree(state.params, A_KEYS), a_mask, cfg.lr, 0.9, 0.999)
    return StepOutput(
        state=TrainState(params={**new_g, **new_d, **new_a}, opt_g=og, opt_d=od, opt_a=oa),
        metrics={k: aux[k] for k in ("loss/gen", "loss/disc", "loss/adj")},
        fake_image=aux["fake"],
        adj_image=aux["adj"],
    )


def bench_fn(step, state, label):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    b = [make_batch(cfg, k) for k in ks]
    rng = jax.random.PRNGKey(2)
    for i in range(4):
        out = step(state, b[i % 2], b[2 + (i % 2)], rng, jnp.int32(i + 11))
        state = out.state
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        out = step(state, b[i % 2], b[2 + (i % 2)], rng, jnp.int32(i + 11))
        state = out.state
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:20s} {dt*1e3:7.2f} ms  {64/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    masks = build_partition_masks(state.params)
    step_b = jax.jit(functools.partial(step_concat, part_masks=masks), donate_argnums=(0,))
    bench_fn(step_b, state, "concat-D variant")
    state2 = create_train_state(cfg, jax.random.PRNGKey(0))
    step_a = make_train_step(cfg, state2.params)
    bench_fn(step_a, state2, "current step")

# MEASURED (v5e, 2026-08): concat-D 18.23 ms vs current 17.64 ms — XLA
# already CSEs the duplicated D(fake) forward across the two grad routings;
# concatenating defeats that CSE and nets out slower. Current step stays.
