"""CLI / mode dispatcher.

Reference: main.py:12-13 — ``python main.py <mode> <exp_name> [-e ENV]
[-g GPUS] [--debug]`` with 8 modes: train, plot, visual, random-sample,
evaluate, condition-sample, evaluate-sample, export-model (dispatch
main.py:26-132). Same CLI surface here via ``python -m littlegan_tpu <mode>
<exp_name> ...`` plus TPU-era flags.

Differences (on purpose):
- ``evaluate`` runs IN-PROCESS (the reference shells out to evaluate.py via
  ``os.system``, main.py:85-104 — a process boundary we don't need),
- ``-g/--gpu`` is accepted for compatibility but ignored: device selection
  is JAX-native (mesh_shape/mesh_axes in the config control parallelism).
"""

from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser
from typing import Optional, Sequence

import numpy as np

from littlegan_tpu.config import MODES, Config, load_config


def build_parser() -> ArgumentParser:
    p = ArgumentParser(prog="littlegan-tpu", description="TPU-native LittleGAN framework")
    p.add_argument("mode", type=str, choices=list(MODES), help="run mode")
    p.add_argument("exp_name", type=str, help="experiment name")
    p.add_argument("-e", "--env", type=str, default="sample", help="config environment")
    p.add_argument("-g", "--gpu", type=str, default="", help="ignored (JAX-native device selection)")
    p.add_argument("--debug", action="store_true", help="ignore dirty git tree")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None, dest="epoch")
    p.add_argument("--batch-size", type=int, default=None, dest="batch_size")
    p.add_argument("--synthetic-data", action="store_true", help="use the synthetic dataset")
    # serve-mode knobs (ignored by every other mode; full set of serving
    # options lives on `python -m littlegan_tpu.serving`)
    p.add_argument("--port", type=int, default=8600, help="serve mode: HTTP port")
    p.add_argument(
        "--reload-every", type=float, default=0.0, dest="reload_every",
        help="serve mode: poll + hot-swap new checkpoints every N seconds",
    )
    p.add_argument(
        "--devices", type=int, default=None, dest="serve_devices",
        help="serve mode: shard each device call over N local chips (0 = all)",
    )
    return p


def parse_config(argv: Optional[Sequence[str]] = None) -> Config:
    args = build_parser().parse_args(argv)
    if args.env != "sample" and not os.path.isfile(f"{args.env}.config.json"):
        # the reference hard-fails on a missing env file (config.py:17-31);
        # load_config degrades gracefully for programmatic use, so the CLI
        # must validate — a typo'd -e would otherwise silently train with
        # sample/default hyperparameters and clobber checkpoints
        raise FileNotFoundError(
            f"config environment {args.env!r}: no {args.env}.config.json in "
            f"{os.getcwd()} (config files are looked up in the current "
            "working directory)"
        )
    overrides = {
        k: v
        for k, v in vars(args).items()
        if v is not None
        and k not in ("synthetic_data", "gpu", "port", "reload_every", "serve_devices")
    }
    overrides.pop("debug", None)
    cfg = load_config(args.env, overrides)
    if args.debug:  # CLI flag turns debug ON; a config-file "debug": true
        cfg = cfg.replace(debug=True)  # must not be clobbered by its absence
    if args.synthetic_data:
        cfg.extra["synthetic_data"] = True
    if cfg.mode in ("serve", "visual"):  # port knob rides in extra (not a Config field)
        cfg.extra.setdefault("serve_port", args.port)
        cfg.extra.setdefault("serve_reload_every", args.reload_every)
        if args.serve_devices is not None:
            cfg.extra.setdefault("serve_devices", args.serve_devices)
    return cfg


def _make_dataset(cfg: Config):
    # Synthetic data ONLY on explicit request: silently training on random
    # noise because image_path was typo'd would waste a run and clobber
    # checkpoints (the reference aborts on a missing dataset too).
    if cfg.extra.get("synthetic_data"):
        from littlegan_tpu.data import SyntheticDataset

        n = max(4 * cfg.batch_size, 64)
        print(f"Using SyntheticDataset ({n} items)")
        try:
            import jax

            shard = jax.process_index()  # decorrelated per-host substreams
        except RuntimeError:
            shard = 0
        return SyntheticDataset(cfg, num_items=n, shard_index=shard)
    is_zip = os.path.isfile(cfg.image_path) and cfg.image_path.lower().endswith(".zip")
    if not (os.path.isdir(cfg.image_path) or is_zip):
        raise FileNotFoundError(
            f"image_path {cfg.image_path!r} is not a directory or .zip archive; "
            f"pass --synthetic-data to run without CelebA"
        )
    from littlegan_tpu.data import CelebA

    # multi-host DP: each host feeds its own shard of the file list
    # (jax.process_* are 0/1 on single-host; no-op there)
    try:
        import jax

        shard_index, shard_count = jax.process_index(), jax.process_count()
    except RuntimeError:  # backend init failure should not kill data loading
        shard_index, shard_count = 0, 1
    return CelebA(cfg, shard_index=shard_index, shard_count=shard_count)


def main(argv: Optional[Sequence[str]] = None) -> int:
    from littlegan_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_config(argv)
    print("Application Params:", json.dumps(cfg.to_json_dict(), default=str)[:500])
    print("Running Mode:", cfg.mode)

    if cfg.mode not in ("visual", "report"):  # these read artifacts only —
        # no accelerator needed. Everything else: fail FAST with remediation
        # text when the TPU tunnel would hang device discovery forever
        # (utils/backend_probe.py)
        from littlegan_tpu.utils.backend_probe import ensure_live_backend_or_exit

        ensure_live_backend_or_exit()

    from littlegan_tpu.training.trainer import Trainer
    from littlegan_tpu.utils.provenance import ensure_clean_tree
    from littlegan_tpu.utils.image import ensure_pm1, save_image

    if cfg.mode == "train":
        ensure_clean_tree(cfg)  # main.py:27-29
        data = _make_dataset(cfg)
        print("Using Attribute:", data.label)
        Trainer(cfg, data).train()

    elif cfg.mode == "visual":  # main.py:34-36
        import subprocess

        logdir = os.path.join(cfg.result_dir, "log")
        print("The result path is", logdir)
        # argv list, not a shell string: exp_name is user input (spaces /
        # metacharacters must stay one --logdir value, never shell-run)
        try:
            rc = subprocess.run(
                ["tensorboard", "--host", "0.0.0.0", "--logdir", logdir]
            ).returncode
        except KeyboardInterrupt:  # user stopped a working server: not an error
            rc = 0
        except FileNotFoundError:  # tensorboard not installed
            rc = 127
        if rc == 127:
            # no tensorboard binary: serve the built-in HTML report instead
            # (regenerated per request — refresh tracks a live run). Scalars
            # stay inspectable without installing anything.
            from littlegan_tpu.report import serve_report

            print(
                "tensorboard unavailable; serving the built-in report instead "
                f"(event files are TensorBoard-format at {logdir})"
            )
            serve_report(cfg, port=int(cfg.extra.get("serve_port", 8600)))
        elif rc not in (0, 130, -2):  # 130 / -SIGINT: Ctrl-C on a working server
            print("tensorboard unavailable; event files are TensorBoard-format at", logdir)

    elif cfg.mode == "plot":  # main.py:37-40
        cfg = cfg.replace(reuse=True)
        print(Trainer(cfg, None).plot())

    elif cfg.mode == "random-sample":  # main.py:41-57
        cfg = cfg.replace(reuse=True)
        data = _make_dataset(cfg)
        trainer = Trainer(cfg, data)
        it = data.epoch_iterator(0)
        now = int(time.time())
        rng = np.random.default_rng(cfg.seed)
        for b in range(cfg.random_sample_batch):
            try:
                image, cond = next(it)
            except StopIteration:  # short dataset: re-iterate (new epoch perm)
                it = data.epoch_iterator(b + 1)
                try:
                    image, cond = next(it)
                except StopIteration:
                    raise ValueError(
                        f"dataset yields ZERO full batches (needs >= "
                        f"{cfg.batch_size} images); add data or lower batch_size"
                    ) from None
            image = ensure_pm1(image)
            noise = rng.normal(size=(cond.shape[0], cfg.noise_dim)).astype(np.float32)
            trainer.predict(
                noise, cond, image,
                os.path.join(cfg.result_dir, "sample", f"generator-{now}-{b}.jpg"),
                os.path.join(cfg.result_dir, "sample", f"discriminator-{now}-{b}.json"),
                os.path.join(cfg.result_dir, "sample", f"adjuster-{now}-{b}.jpg"),
            )
            np.savez_compressed(
                os.path.join(cfg.result_dir, "sample", f"input_data-{now}-{b}.npz"),
                n=noise, c=cond, i=image,
            )

    elif cfg.mode == "evaluate-sample":  # main.py:58-81
        cfg = cfg.replace(reuse=True)
        data = _make_dataset(cfg)
        trainer = Trainer(cfg, data)
        from littlegan_tpu.utils.image import BatchImageWriter

        batches = int(np.ceil(cfg.evaluate_sample_size / cfg.batch_size))
        rng = np.random.default_rng(cfg.seed)
        it = data.epoch_iterator(0)
        base = 1  # contiguous 1..N numbering even when batches carry fewer
        # than cfg.batch_size rows (multi-host row slicing)
        writer = BatchImageWriter()  # JPEG encode/IO overlaps device compute
        for b in range(batches):
            try:
                image, cond = next(it)
            except StopIteration:
                it = data.epoch_iterator(b + 1)
                try:
                    image, cond = next(it)
                except StopIteration:
                    raise ValueError(
                        f"dataset yields ZERO full batches (needs >= "
                        f"{cfg.batch_size} images); add data or lower batch_size"
                    ) from None
            noise = rng.normal(size=(cond.shape[0], cfg.noise_dim)).astype(np.float32)
            # fused uint8 path (trainer.sample_u8): one dispatch per batch,
            # uint8 images both ways — the 30k protocol was transfer-bound
            # through predict()'s four f32 image moves per batch
            gen_image, d_scores, adj_real, adj_fake = trainer.sample_u8(noise, cond, image)
            if getattr(trainer, "_host0", True):
                with open(
                    os.path.join(cfg.result_dir, "evaluate", "disc", f"{b}.json"), "w"
                ) as f:
                    json.dump(d_scores, f)
            for i in range(gen_image.shape[0]):
                writer.save(gen_image[i], os.path.join(cfg.result_dir, "evaluate", "gen", f"{base + i}.jpg"))
                if adj_real is not None and adj_fake is not None:
                    writer.save(adj_real[i], os.path.join(cfg.result_dir, "evaluate", "adj", f"real_{base + i}.jpg"))
                    writer.save(adj_fake[i], os.path.join(cfg.result_dir, "evaluate", "adj", f"fake_{base + i}.jpg"))
            base += gen_image.shape[0]
            if (b + 1) % 50 == 0:
                print(f"evaluate-sample: {b + 1}/{batches} batches")
        writer.close()

    elif cfg.mode == "evaluate":  # main.py:82-104, in-process
        from littlegan_tpu.eval.evaluate import evaluate_generated, fid_label

        known = {"fid", "is", "kid", "prdc"}
        metrics = {m.lower() for m in cfg.eval_metrics}
        if not metrics <= known:
            raise ValueError(
                f"unknown eval_metrics {sorted(metrics - known)}; choose from {sorted(known)}"
            )
        stats = os.path.join(cfg.test_data_dir, cfg.evaluate_pre_calculated)
        for sub, log in (("gen", "fid-gen.log"), ("adj", "fid-adj.log")):
            if sub == "adj" and not cfg.train_adj:
                continue
            fid = evaluate_generated(
                cfg,
                os.path.join(cfg.result_dir, "evaluate", sub),
                stats,
                os.path.join(cfg.result_dir, "evaluate", log),
                with_is="is" in metrics,
                with_kid="kid" in metrics,
                with_prdc="prdc" in metrics,
            )
            print(f"{fid_label(cfg)} ({sub}): {fid}")

    elif cfg.mode == "condition-sample":  # main.py:105-125
        cfg = cfg.replace(reuse=True)
        trainer = Trainer(cfg, None)
        # the reference's 8 hand-picked 7-bit attribute rows (main.py:108-117)
        cond = np.array(
            [
                [0, 0, 0, 0, 0, 1, 0],
                [0, 0, 0, 0, 0, 1, 1],
                [0, 0, 0, 0, 0, 0, 1],
                [1, 0, 0, 0, 0, 0, 1],
                [1, 0, 0, 0, 1, 0, 1],
                [1, 0, 1, 0, 1, 0, 1],
                [1, 1, 1, 0, 1, 0, 1],
                [1, 1, 1, 1, 1, 0, 1],
            ],
            np.float32,
        )
        if cfg.cond_dim != 7:  # generalize the hardcoded sweep to any cond_dim
            rng = np.random.default_rng(cfg.seed)
            cond = (rng.random((8, cfg.cond_dim)) < 0.5).astype(np.float32)
        from littlegan_tpu.training.state import eval_params

        rng = np.random.default_rng(cfg.seed)
        for i in range(1, 1 + cfg.condition_sample_batch):
            noise = np.repeat(rng.normal(size=(1, cfg.noise_dim)), 8, 0).astype(np.float32)
            img = trainer._gen_jit(eval_params(trainer.state), noise, cond)
            save_image(np.asarray(img), os.path.join(cfg.result_dir, "sample", f"condition-gen-{i}.jpg"), (1, 8))

    elif cfg.mode == "interpolate":  # beyond-reference latent-space tooling
        cfg = cfg.replace(reuse=True)
        trainer = Trainer(cfg, None)
        rng = np.random.default_rng(cfg.seed)
        from littlegan_tpu.utils.image import soft

        rows, steps = cfg.interpolate_rows, cfg.interpolate_steps
        if rows < 1 or steps < 2:
            raise ValueError(
                f"interpolate needs interpolate_rows >= 1 and interpolate_steps >= 2, "
                f"got {rows}/{steps}"
            )
        now = int(time.time())
        t = np.linspace(0.0, 1.0, steps, dtype=np.float32)

        # 1) latent slerp grid: one (z0 -> z1) pair per row at a fixed
        # random condition (utils/latent.py on why slerp, not lerp)
        from littlegan_tpu.utils.latent import slerp

        z0 = rng.normal(size=(rows, cfg.noise_dim)).astype(np.float32)
        z1 = rng.normal(size=(rows, cfg.noise_dim)).astype(np.float32)
        # grid index fills columns downward (utils/image.py to_grid): batch
        # order [t0 r0..rN, t1 r0..rN, ...] -> (rows, steps) tiling
        z = slerp(z0, z1, t).reshape(steps * rows, cfg.noise_dim)
        # dataset-convention conditions: softened +/-1 (data/celeba.py)
        row_cond = soft(np.where(rng.random((rows, cfg.cond_dim)) < 0.5, -1.0, 1.0)).astype(np.float32)
        gen = trainer.generate(z, np.tile(row_cond, (steps, 1)))
        save_image(
            gen, os.path.join(cfg.result_dir, "sample", f"interpolate-z-{now}.jpg"),
            (rows, steps),
        )

        # 2) adjuster attribute sweep: one base image, each ROW sweeps one
        # attribute's target from soft(-1) to soft(+1) across the columns
        if cfg.train_adj:
            base_z = rng.normal(size=(1, cfg.noise_dim)).astype(np.float32)
            base_cond = soft(np.where(rng.random((1, cfg.cond_dim)) < 0.5, -1.0, 1.0)).astype(np.float32)
            base = trainer.generate(base_z, base_cond)  # (1, H, W, C)
            sweep = np.tile(base_cond, (steps * cfg.cond_dim, 1))
            for j in range(cfg.cond_dim):
                # column t of row j: attribute j forced to soft(2t-1)
                sweep[np.arange(steps) * cfg.cond_dim + j, j] = soft(2.0 * t - 1.0)
            adj = trainer.adjust(np.tile(base, (steps * cfg.cond_dim, 1, 1, 1)), sweep)
            save_image(
                adj,
                os.path.join(cfg.result_dir, "sample", f"interpolate-attr-{now}.jpg"),
                (cfg.cond_dim, steps),
            )
        print(f"interpolate grids -> {os.path.join(cfg.result_dir, 'sample')}")

    elif cfg.mode == "export-model":  # main.py:126-130
        cfg = cfg.replace(reuse=True, restore=True)
        path = Trainer(cfg, None).export_model_checkpoint()
        print("Exported weights-only checkpoint to", path)

    elif cfg.mode == "serve":  # beyond-reference: HTTP inference server
        from littlegan_tpu.serving import serve

        serve(
            cfg.replace(restore=True),
            port=int(cfg.extra.get("serve_port", 8600)),
            batch_size=cfg.batch_size,
            reload_every_s=float(cfg.extra.get("serve_reload_every", 0.0)),
            devices=cfg.extra.get("serve_devices"),
        )

    elif cfg.mode == "report":  # beyond-reference: self-contained HTML report
        from littlegan_tpu.report import generate_report

        generate_report(cfg)

    else:
        print("Unknown mode:", cfg.mode)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
