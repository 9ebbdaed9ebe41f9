"""Convergence campaign: long-horizon training with a pinned metric trajectory.

Round-2 verdict item #5: train the structured synthetic set (the in-container
stand-in for CelebA — zero egress, no real faces on disk) over a long horizon
and record a loss + conditioning + FID-trend trajectory artifact, optionally
with the Config.cond_bias extension chasing the 7th (global-statistic)
attribute.

Per eval point the script records:
  - train losses (G/D/A) averaged over the chunk's TB-logged steps,
  - generator conditioning effect sizes (7 attrs, fixed noise, bit flipped),
  - adjuster effect sizes on REAL images,
  - discriminator cond-head accuracy,
  - FID TREND between 1,024 generated images and dataset stats, computed
    with the deterministic RANDOM-INIT Inception (allow_random_fid) — a
    self-consistent trend metric, loudly NOT comparable to published FID.

Usage:
  python scripts/campaign.py <exp> [--epochs N] [--eval-every K]
      [--cond-bias] [--data /tmp/structured_celeba] [--dim 128] [--n 6400]
Artifacts: result/<exp>/campaign_trajectory.json (one record per eval).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("exp")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--eval-every", type=int, default=10)
    p.add_argument("--cond-bias", action="store_true")
    p.add_argument("--ema", type=float, default=0.0, help="generator EMA decay (0 = off)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument(
        "--grad-accum", type=int, default=1,
        help="micro-pairs per update (scan-accum path when >1; effective "
        "batch = grad_accum * batch_size)",
    )
    p.add_argument(
        "--adj-half", action="store_true",
        help="train the adjuster on one alternating N-row batch per step "
        "(Config.adj_half_batch) instead of the reference 2N concat",
    )
    p.add_argument(
        "--moment-dtype", default="float32", choices=("float32", "bfloat16"),
        help="Adam moment storage dtype (Config.moment_dtype)",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize each network application in the backward "
        "(Config.remat — identical math; needed to FIT 2048²+ on one chip)",
    )
    p.add_argument(
        "--ckpt-every", type=int, default=1,
        help="epoch-checkpoint cadence (Config.ckpt_every) — at 512²+ a "
        "full-state pull is gigabytes over the tunnel; align with "
        "--eval-every so evaluated epochs stay pinnable",
    )
    p.add_argument(
        "--fid-n", type=int, default=1024,
        help="generated images per FID/IS/KID trend eval (smaller = cheaper "
        "smoke runs; trend values are only comparable at equal --fid-n)",
    )
    p.add_argument(
        "--eval-chunk", type=int, default=0,
        help="generated images per device dispatch in the FID-trend eval "
        "(0 = auto: 128 up to 512², 32 at 1024²+ — a 128-row decoder "
        "forward at 1024² needs ~17 GB of activations, past v5e HBM)",
    )
    p.add_argument(
        "--eval-rows", type=int, default=0,
        help="rows per effect-size stat batch (0 = auto: 64 up to 512², "
        "32 at 1024²+; same HBM reasoning as --eval-chunk)",
    )
    p.add_argument(
        "--no-donate", action="store_true",
        help="disable train-state buffer donation in the dispatch (donation "
        "aliases the output state onto the input — ~2.3 GB of peak HBM at "
        "1024²; math is identical either way, tested)",
    )
    p.add_argument("--data", default="/tmp/structured_celeba")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--n", type=int, default=6400)
    p.add_argument("--result-dir", default="/tmp/campaign_result")
    args = p.parse_args()

    if not os.path.isdir(os.path.join(args.data, "img")):
        from scripts.make_structured_data import generate

        generate(args.data, args.n, args.dim)

    from littlegan_tpu.config import Config
    from littlegan_tpu.data import CelebA
    from littlegan_tpu.eval.evaluate import compute_features
    from littlegan_tpu.eval.fid import activation_statistics, frechet_distance
    from littlegan_tpu.eval.inception import (
        class_probs_from_features,
        inception_features,
        init_inception_params,
    )
    from littlegan_tpu.eval.inception_score import inception_score
    from littlegan_tpu.eval.kid import kid
    from littlegan_tpu.eval.prdc import prdc
    from littlegan_tpu.training.state import eval_params
    from littlegan_tpu.training.trainer import Trainer
    from littlegan_tpu.utils.image import ensure_pm1, soft
    from littlegan_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    base = dict(
        exp_name=args.exp,
        mode="train",
        image_path=os.path.join(args.data, "img"),
        attr_path=os.path.join(args.data, "attrs.txt"),
        image_dim=args.dim,
        init_dim=args.dim // 16,  # 4 stride-2 encoder halvings (reference geometry)
        batch_size=args.batch_size,
        grad_accum=args.grad_accum,
        compute_dtype="bfloat16",
        device_data=True,
        # scan path consumes 2*K*grad_accum batch ids per dispatch; snap K so
        # one dispatch never exceeds the epoch (trainer asserts coverage)
        steps_per_dispatch=(
            8 if args.n // args.batch_size >= 16 * args.grad_accum else 1
        ),
        freq_gen=10_000_000,  # artifact cadences off; campaign does its own evals
        freq_test=10_000_000,
        all_result_dir=args.result_dir,
        test_data_dir=os.path.join(args.result_dir, "test-data"),
        restore=True,
        reuse=True,
        debug=True,
        donate_state=not args.no_donate,
        ckpt_every=args.ckpt_every,
        keep_checkpoints=3,  # a 512² full-state ckpt is ~0.8 GB (the dense
        # heads scale with init_dim²); 100 unpruned epochs filled the disk
        cond_bias=args.cond_bias,
        ema_decay=args.ema,
        adj_half_batch=args.adj_half,
        moment_dtype=args.moment_dtype,
        remat=args.remat,
        allow_random_fid=True,
    )

    # --- dataset stats for the FID trend (random-init Inception, once) ---
    cfg0 = Config(**base)
    ds = CelebA(cfg0)
    # Inception weights ride as jit ARGUMENTS (device-resident), never as
    # closure constants — closing over the tree bakes ~90 MB into every HLO
    # and slows the tunnel compile (same fix as eval/evaluate._featurizer)
    incep = jax.device_put(init_inception_params("", seed=0))
    # uint8 ships to the device and upcasts THERE: at 512² a 128-image f32
    # chunk is 400 MB of host->device transfer vs 100 MB as uint8 — over
    # this container's tunnel that difference dominates the eval wall time
    _feat = jax.jit(lambda p, imgs: inception_features(p, imgs.astype(jnp.float32)))
    feat_fn = lambda imgs: _feat(incep, imgs)

    def features_of(images_u8: np.ndarray) -> np.ndarray:
        feats = []
        bs = 128
        for i in range(0, len(images_u8), bs):
            chunk = images_u8[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            f = np.asarray(feat_fn(jnp.asarray(chunk)))
            feats.append(f[: bs - pad] if pad else f)
        return np.concatenate(feats)

    stats_path = os.path.join(args.result_dir, f"ref_stats_{args.dim}.npz")
    if os.path.isfile(stats_path):
        with np.load(stats_path) as z:
            mu_r, sigma_r = z["mu"], z["sigma"]
            # KID trend needs raw real rows; a pre-KID-era cache skips it
            real_feats = z["features"] if "features" in z.files else None
    else:
        imgs = []
        it = ds.epoch_iterator(0)
        for _ in range(max(1, min(ds.batches, 2048 // cfg0.batch_size))):
            img, _ = next(it)
            imgs.append(img if img.dtype == np.uint8 else ((img + 1) * 127.5).astype(np.uint8))
        real_u8 = np.concatenate(imgs)
        real_feats = features_of(real_u8)
        mu_r, sigma_r = activation_statistics(real_feats)
        real_feats = real_feats[:1024].astype(np.float16)
        os.makedirs(args.result_dir, exist_ok=True)
        np.savez_compressed(stats_path, mu=mu_r, sigma=sigma_r, features=real_feats)
        print(f"dataset stats over {len(real_u8)} images -> {stats_path}")

    from littlegan_tpu.models import adjuster_apply, generator_apply

    @jax.jit
    def _gen_feat(inc, params, noise, cond):
        img = generator_apply(params, noise, cond, cfg0).astype(jnp.float32)
        u8 = ((img + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return inception_features(inc, u8.astype(jnp.float32))

    gen_feat = lambda params, noise, cond: _gen_feat(incep, params, noise, cond)

    def region_means(x):
        """Mean intensity of each attribute's region/channel, on device
        (indices MUST match scripts/make_structured_data.py::make_image).
        All 7 means in one dispatch — only 7 floats cross device->host
        instead of the image batch (a 64 x 512² f32 batch is 200 MB)."""
        x = (x.astype(jnp.float32) + 1.0) / 2.0
        d = x.shape[1]
        return jnp.stack(
            [
                jnp.mean(x[:, :, :, 0]),
                jnp.mean(x[:, d // 4 : d // 2, :, 1]),
                jnp.mean(x[:, d // 2 :, :, 2]),
                jnp.mean(x[:, d // 3 : 2 * d // 3, d // 3 : 2 * d // 3, :]),
                jnp.mean(x[:, d // 8 : d // 4, :, :]),
                jnp.mean(x[:, : d // 4, : d // 4, :]),
                jnp.mean(x),
            ]
        )

    @jax.jit
    def gen_stats(params, noise, cond):
        return region_means(generator_apply(params, noise, cond, cfg0))

    @jax.jit
    def adj_stats(params, img, cond):
        return region_means(adjuster_apply(params, img, cond, cfg0))

    eval_chunk = args.eval_chunk or (128 if args.dim <= 512 else 32)
    eval_rows = args.eval_rows or (64 if args.dim <= 512 else 32)
    if args.fid_n % eval_chunk:
        raise SystemExit(
            f"--fid-n {args.fid_n} must be a multiple of the eval chunk "
            f"{eval_chunk} (one compiled generate->featurize dispatch shape)"
        )
    rng = np.random.default_rng(0)
    eval_noise = rng.normal(size=(eval_rows, cfg0.noise_dim)).astype(np.float32)
    fid_noise = rng.normal(size=(args.fid_n, cfg0.noise_dim)).astype(np.float32)
    fid_cond = soft(np.where(rng.random((args.fid_n, cfg0.cond_dim)) < 0.5, -1.0, 1.0)).astype(np.float32)
    base_cond = np.full((eval_rows, cfg0.cond_dim), soft(-1.0), np.float32)
    real_img, real_cond = next(ds.epoch_iterator(1))
    real_pm1 = ensure_pm1(real_img)

    # ONE Trainer for the whole horizon; periodic evals run from the
    # epoch_callback hook (trainer.py::train) so the device store / compiled
    # step survive across eval points (the previous per-chunk Trainer
    # reconstruction re-uploaded the store — ~2.5 GB at 512² — every chunk).
    # Still resumable: the trainer restores its epoch, and recorded epochs
    # are skipped by the callback.
    cfg = Config(**{**base, "epoch": args.epochs})
    tr = Trainer(cfg, ds)
    traj_path = os.path.join(cfg.result_dir, "campaign_trajectory.json")
    records = json.load(open(traj_path)) if os.path.isfile(traj_path) else []
    evaluated = {r["epoch"] for r in records}
    chunk_t0 = [time.time()]

    # keep the best-FID-trend epoch checkpoint alive through retention
    # (keep_checkpoints=3 once pruned a campaign's best epoch, CAMPAIGN.md);
    # on resume, re-pin from the recorded trajectory (pins are per-Trainer)
    best = [None, None]  # [fid, epoch]
    for r in records:
        if best[0] is None or r["fid_trend_random_init"] < best[0]:
            best[:] = [r["fid_trend_random_init"], r["epoch"]]
    if best[1] is not None:
        tr.pin_checkpoint(best[1])

    def _maybe_pin_best(fid_trend: float, epoch: int) -> None:
        if best[0] is not None and fid_trend >= best[0]:
            return
        if best[1] is not None:
            tr.unpin_checkpoint(best[1])
        tr.pin_checkpoint(epoch)
        best[:] = [fid_trend, epoch]

    def eval_point(epoch: int) -> None:
        if (epoch % args.eval_every != 0 and epoch != args.epochs) or epoch in evaluated:
            return
        train_secs = time.time() - chunk_t0[0]

        # EMA weights when enabled (the campaign measures what users sample)
        params = eval_params(tr.state)

        # generator effect sizes
        gen_fx = []
        g_base = np.asarray(gen_stats(params, eval_noise, base_cond))
        for j in range(cfg.cond_dim):
            c = base_cond.copy()
            c[:, j] = soft(1.0)
            g = np.asarray(gen_stats(params, eval_noise, c))
            gen_fx.append(round(float(g[j] - g_base[j]), 4))

        # adjuster effect sizes on real images (device-resident batch:
        # uploaded once per eval, stats come back as 7 floats per call)
        adj_fx = []
        n64 = jax.device_put(real_pm1[:eval_rows])
        rows = int(n64.shape[0])
        for j in range(cfg.cond_dim):
            on = np.full((rows, cfg.cond_dim), (soft(-1.0) + 1) / 2, np.float32)
            off = on.copy()
            on[:, j] = (soft(1.0) + 1) / 2
            s_on = np.asarray(adj_stats(params, n64, on))
            s_off = np.asarray(adj_stats(params, n64, off))
            adj_fx.append(round(float(s_on[j] - s_off[j]), 4))

        # D cond-head accuracy
        _, d_cond = tr._disc_jit(params, n64)
        acc = float(
            ((np.asarray(d_cond) > 0.5) == (real_cond[: len(n64)] > 0)).mean()
        )

        # FID trend (random-init Inception — NOT comparable to published FID)
        # generate -> uint8 quantize -> inception features in ONE device
        # dispatch per chunk: only (128, 2048) features come back to the
        # host (a 512² f32 image chunk alone is 400 MB of device->host
        # transfer; same math as the previous host round-trip — the uint8
        # cast is the identical truncating quantization)
        feats = []
        for i in range(0, len(fid_noise), eval_chunk):
            f = np.asarray(
                gen_feat(params, fid_noise[i : i + eval_chunk], fid_cond[i : i + eval_chunk])
            )
            feats.append(f)
        gen_feats = np.concatenate(feats)
        mu_g, sigma_g = activation_statistics(gen_feats)
        fid_trend = float(frechet_distance(mu_r, sigma_r, mu_g, sigma_g))
        _maybe_pin_best(fid_trend, epoch)
        # IS/KID trends from the SAME features (eval/inception_score, eval/kid)
        # — random-init tagged like the FID trend, NOT comparable to published
        is_trend, _ = inception_score(class_probs_from_features(incep, gen_feats))
        kid_trend = (
            kid(real_feats, gen_feats, subset_size=256, n_subsets=32)[0]
            if real_feats is not None
            else None
        )
        # precision/recall/density/coverage trend (eval/prdc.py) — fidelity
        # vs diversity split the FID trend can't show (mode collapse drops
        # recall/coverage while precision holds). Random-init tagged too.
        prdc_trend = None
        if real_feats is not None and min(len(real_feats), len(gen_feats)) > 5:
            prdc_trend = {
                name: round(v, 4)
                for name, v in prdc(
                    np.asarray(real_feats, np.float64), gen_feats, k=5
                ).items()
            }

        rec = {
            "epoch": epoch,
            "global_step": tr.global_step,
            "train_secs": round(train_secs, 1),
            "gen_effects": gen_fx,
            "gen_learned": int(sum(d > 0.02 for d in gen_fx)),
            "adj_effects": adj_fx,
            "adj_learned": int(sum(d > 0.02 for d in adj_fx)),
            "d_cond_acc": round(acc, 4),
            "fid_trend_random_init": round(fid_trend, 3),
            "is_trend_random_init": round(is_trend, 4),
            "kid_trend_random_init": round(kid_trend, 6) if kid_trend is not None else None,
            "prdc_trend_random_init": prdc_trend,
            "cond_bias": args.cond_bias,
            "ema_decay": args.ema,
            "batch_size": args.batch_size,
            "grad_accum": args.grad_accum,
        }
        records.append(rec)
        evaluated.add(epoch)
        with open(traj_path, "w") as f:
            json.dump(records, f, indent=1)
        print("EVAL", json.dumps(rec), flush=True)  # nohup/pipe runs are block-buffered
        chunk_t0[0] = time.time()

    tr.train(epoch_callback=eval_point)
    print(f"trajectory -> {traj_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
