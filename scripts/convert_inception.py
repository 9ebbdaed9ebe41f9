"""Convert InceptionV3 weights to littlegan-tpu's FID npz format.

The reference pins FID to a 2015 frozen InceptionV3 GraphDef downloaded at
runtime (fid.py:273-288). This environment has zero egress, so conversion is
offline, from whatever checkpoint format a container DOES carry:

- pytorch-FID ``pt_inception-2015-12-05-*.pth`` (the **FIDInception**
  checkpoint behind virtually all published FID numbers — round-4 verdict
  #1): same key names as torchvision but a 1008-class fc and three pooling
  deviations (InceptionA/C/E_1 avg-pools count_include_pad=False, E_2 a
  3x3/stride-1 max-pool). Detected by the 1008-row fc; the output npz gets
  a ``meta/fid2015_pool`` marker that switches eval/inception.py onto the
  FIDInception pooling graph — converting these weights onto the
  torchvision graph would be a silently wrong network,
- torchvision ``inception_v3`` .pth state_dict (ImageNet weights),
- Keras ``inception_v3`` .h5 weight files (keras.applications download
  cache, ``~/.keras/models``) — round-4 verdict #6,
- a TF SavedModel directory holding a keras InceptionV3,
- an .npz with torchvision key names (test fixtures).

Usage:
  python scripts/convert_inception.py /path/to/inception_v3.{pth,h5} out.npz
  python scripts/convert_inception.py /path/to/saved_model_dir out.npz
  python scripts/convert_inception.py --probe      # search local caches
       (add --allow-full-unpickle ONLY for trusted full-module .pth
        checkpoints that fail the safe weights_only load — full unpickling
        runs code from the file)

Mapping: source layer names -> our layer names; conv weights end HWIO
(torchvision OIHW is transposed; Keras is HWIO already); each BatchNorm is
folded into an affine (scale, offset) pair: scale = gamma / sqrt(var +
eps), offset = beta - mean * scale (eps = 1e-3 in both torchvision and
keras.applications; keras builds its BNs with scale=False, i.e. gamma=1).
Keras layers carry no branch names — only creation-order indices
(``conv2d_N``/``batch_normalization_N``) — so the Keras paths map by the
keras.applications build order (``keras_order()``, validated against a
live ``tf.keras.applications.InceptionV3`` in tests/test_fid.py).

NOTE on comparability: the torchvision and keras checkpoints are both
ports of the same 2015 slim training run, but their weights differ
slightly, so FID values are only comparable between runs using the SAME
weight file — every emitted metric line is tagged with the weight source
(eval/evaluate.py::fid_label) for exactly this reason.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

# our name -> torchvision module prefix
_NAME_MAP = {
    "stem/c1": "Conv2d_1a_3x3",
    "stem/c2": "Conv2d_2a_3x3",
    "stem/c3": "Conv2d_2b_3x3",
    "stem/c4": "Conv2d_3b_1x1",
    "stem/c5": "Conv2d_4a_3x3",
}
for mix, tv in (("mix5b", "Mixed_5b"), ("mix5c", "Mixed_5c"), ("mix5d", "Mixed_5d")):
    _NAME_MAP.update(
        {
            f"{mix}/b1x1": f"{tv}.branch1x1",
            f"{mix}/b5x5_1": f"{tv}.branch5x5_1",
            f"{mix}/b5x5_2": f"{tv}.branch5x5_2",
            f"{mix}/b3x3_1": f"{tv}.branch3x3dbl_1",
            f"{mix}/b3x3_2": f"{tv}.branch3x3dbl_2",
            f"{mix}/b3x3_3": f"{tv}.branch3x3dbl_3",
            f"{mix}/bpool": f"{tv}.branch_pool",
        }
    )
_NAME_MAP.update(
    {
        "mix6a/b3x3": "Mixed_6a.branch3x3",
        "mix6a/bd_1": "Mixed_6a.branch3x3dbl_1",
        "mix6a/bd_2": "Mixed_6a.branch3x3dbl_2",
        "mix6a/bd_3": "Mixed_6a.branch3x3dbl_3",
    }
)
for mix, tv in (("mix6b", "Mixed_6b"), ("mix6c", "Mixed_6c"), ("mix6d", "Mixed_6d"), ("mix6e", "Mixed_6e")):
    _NAME_MAP.update(
        {
            f"{mix}/b1x1": f"{tv}.branch1x1",
            f"{mix}/b7_1": f"{tv}.branch7x7_1",
            f"{mix}/b7_2": f"{tv}.branch7x7_2",
            f"{mix}/b7_3": f"{tv}.branch7x7_3",
            f"{mix}/bd_1": f"{tv}.branch7x7dbl_1",
            f"{mix}/bd_2": f"{tv}.branch7x7dbl_2",
            f"{mix}/bd_3": f"{tv}.branch7x7dbl_3",
            f"{mix}/bd_4": f"{tv}.branch7x7dbl_4",
            f"{mix}/bd_5": f"{tv}.branch7x7dbl_5",
            f"{mix}/bpool": f"{tv}.branch_pool",
        }
    )
_NAME_MAP.update(
    {
        "mix7a/b3_1": "Mixed_7a.branch3x3_1",
        "mix7a/b3_2": "Mixed_7a.branch3x3_2",
        "mix7a/b7_1": "Mixed_7a.branch7x7x3_1",
        "mix7a/b7_2": "Mixed_7a.branch7x7x3_2",
        "mix7a/b7_3": "Mixed_7a.branch7x7x3_3",
        "mix7a/b7_4": "Mixed_7a.branch7x7x3_4",
    }
)
for mix, tv in (("mix7b", "Mixed_7b"), ("mix7c", "Mixed_7c")):
    _NAME_MAP.update(
        {
            f"{mix}/b1x1": f"{tv}.branch1x1",
            f"{mix}/b3_1": f"{tv}.branch3x3_1",
            f"{mix}/b3_2a": f"{tv}.branch3x3_2a",
            f"{mix}/b3_2b": f"{tv}.branch3x3_2b",
            f"{mix}/bd_1": f"{tv}.branch3x3dbl_1",
            f"{mix}/bd_2": f"{tv}.branch3x3dbl_2",
            f"{mix}/bd_3a": f"{tv}.branch3x3dbl_3a",
            f"{mix}/bd_3b": f"{tv}.branch3x3dbl_3b",
            f"{mix}/bpool": f"{tv}.branch_pool",
        }
    )


def convert(state_dict, eps: float = 1e-3, variant: str = "auto") -> dict:
    """torchvision-keyed state_dict -> our npz mapping.

    ``variant``: "auto" detects the pytorch-FID FIDInception checkpoint by
    its 1008-class fc (the 2015 graph's class count; torchvision's is
    1000) and stamps the ``meta/fid2015_pool`` marker the extractor
    switches pooling on. "tv"/"fid2015" force it (fc-less partial dumps
    can't auto-detect)."""
    if variant not in ("auto", "tv", "fid2015"):
        raise SystemExit(f"unknown variant {variant!r} (auto|tv|fid2015)")
    out = {}
    get = lambda k: np.asarray(state_dict[k].cpu().numpy() if hasattr(state_dict[k], "cpu") else state_dict[k])
    for ours, tv in _NAME_MAP.items():
        w = get(f"{tv}.conv.weight")  # OIHW
        out[f"{ours}/w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # HWIO
        gamma = get(f"{tv}.bn.weight")
        beta = get(f"{tv}.bn.bias")
        mean = get(f"{tv}.bn.running_mean")
        var = get(f"{tv}.bn.running_var")
        scale = gamma / np.sqrt(var + eps)
        out[f"{ours}/scale"] = scale.astype(np.float32)
        out[f"{ours}/offset"] = (beta - mean * scale).astype(np.float32)
    # classifier head — not used by FID's pool features, but Inception
    # Score needs the class logits (torchvision fc: (1000, 2048) + bias;
    # pt_inception: (1008, 2048), the 2015 graph's background-class layout)
    if "fc.weight" in state_dict:
        fc_w = get("fc.weight")
        out["fc/w"] = np.transpose(fc_w, (1, 0)).astype(np.float32)
        out["fc/b"] = get("fc.bias").astype(np.float32)
        if variant == "auto":
            variant = "fid2015" if fc_w.shape[0] == 1008 else "tv"
    else:  # pragma: no cover - partial dumps only
        print("NOTE: state_dict has no fc.weight — Inception Score unavailable", file=sys.stderr)
        if variant == "auto":
            print(
                "NOTE: no fc to auto-detect the pooling variant from — "
                "assuming torchvision; pass --variant fid2015 for a "
                "pt_inception partial dump",
                file=sys.stderr,
            )
            variant = "tv"
    if variant == "fid2015":
        out["meta/fid2015_pool"] = np.zeros((), np.float32)
    return out


def synthetic_state_dict(seed: int = 0, variant: str = "tv") -> dict:
    """Random-valued state_dict with torchvision ``inception_v3``'s exact key
    names and tensor shapes (conv weights OIHW, BN vectors), He-scaled so a
    full forward stays finite. Validates the conversion path in-tree — name
    mapping, OIHW->HWIO transpose, BN folding — without a downloaded
    checkpoint (this container has no egress and no torchvision).

    ``variant="fid2015"`` emits the pt_inception layout: identical conv/bn
    keys (pytorch-FID loads its weights into torchvision module names), fc
    with the 2015 graph's 1008 classes."""
    from littlegan_tpu.eval.inception import _conv_specs

    rng = np.random.default_rng(seed)
    sd = {}
    for ours, kh, kw, cin, cout in _conv_specs():
        tv = _NAME_MAP[ours]
        fan_in = kh * kw * cin
        sd[f"{tv}.conv.weight"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), (cout, cin, kh, kw)
        ).astype(np.float32)
        sd[f"{tv}.bn.weight"] = rng.uniform(0.5, 1.5, (cout,)).astype(np.float32)
        sd[f"{tv}.bn.bias"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        sd[f"{tv}.bn.running_mean"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        sd[f"{tv}.bn.running_var"] = rng.uniform(0.5, 1.5, (cout,)).astype(np.float32)
    n_classes = 1008 if variant == "fid2015" else 1000
    sd["fc.weight"] = rng.normal(0, np.sqrt(1.0 / 2048), (n_classes, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(0, 0.01, (n_classes,)).astype(np.float32)
    return sd


def keras_order() -> list[str]:
    """Our 94 conv-bn block names in keras.applications.inception_v3 BUILD
    order — the order keras assigns its ``conv2d_N`` /
    ``batch_normalization_N`` layer indices. Branch order inside every
    mixed block matches torchvision's concat order (verified sub-branch by
    sub-branch against both sources; shape-sequence-validated against a
    live keras model in tests/test_fid.py::test_keras_order_matches_live_model)."""
    names = [f"stem/c{i}" for i in range(1, 6)]
    for mix in ("mix5b", "mix5c", "mix5d"):
        names += [f"{mix}/{b}" for b in ("b1x1", "b5x5_1", "b5x5_2", "b3x3_1", "b3x3_2", "b3x3_3", "bpool")]
    names += ["mix6a/b3x3", "mix6a/bd_1", "mix6a/bd_2", "mix6a/bd_3"]
    for mix in ("mix6b", "mix6c", "mix6d", "mix6e"):
        names += [f"{mix}/{b}" for b in ("b1x1", "b7_1", "b7_2", "b7_3", "bd_1", "bd_2", "bd_3", "bd_4", "bd_5", "bpool")]
    names += [f"mix7a/{b}" for b in ("b3_1", "b3_2", "b7_1", "b7_2", "b7_3", "b7_4")]
    for mix in ("mix7b", "mix7c"):
        names += [f"{mix}/{b}" for b in ("b1x1", "b3_1", "b3_2a", "b3_2b", "bd_1", "bd_2", "bd_3a", "bd_3b", "bpool")]
    assert len(names) == 94
    return names


def convert_keras_arrays(convs, bns, fc=None, eps: float = 1e-3) -> dict:
    """Fold ordered keras conv kernels (HWIO) + BN tuples into our npz keys.

    ``convs``: 94 kernels in build order. ``bns``: 94 matching
    ``(gamma_or_None, beta, moving_mean, moving_var)`` tuples (keras
    builds its inception BNs with scale=False -> gamma None = 1).
    ``fc``: optional (kernel (2048, 1000), bias) from the 'predictions'
    dense — enables Inception Score."""
    order = keras_order()
    if len(convs) != len(order) or len(bns) != len(order):
        raise SystemExit(
            f"expected {len(order)} conv-bn blocks in keras build order, got "
            f"{len(convs)} convs / {len(bns)} bns — not an InceptionV3?"
        )
    out = {}
    for ours, w, (gamma, beta, mean, var) in zip(order, convs, bns):
        w = np.asarray(w, np.float32)
        if w.ndim != 4:
            raise SystemExit(f"{ours}: conv kernel must be HWIO 4-D, got {w.shape}")
        out[f"{ours}/w"] = w
        g = np.ones_like(np.asarray(var)) if gamma is None else np.asarray(gamma)
        scale = g / np.sqrt(np.asarray(var) + eps)
        out[f"{ours}/scale"] = scale.astype(np.float32)
        out[f"{ours}/offset"] = (np.asarray(beta) - np.asarray(mean) * scale).astype(np.float32)
    if fc is not None:
        out["fc/w"] = np.asarray(fc[0], np.float32)
        out["fc/b"] = np.asarray(fc[1], np.float32)
    else:
        print("NOTE: no 'predictions' dense found — Inception Score unavailable", file=sys.stderr)
    return out


def load_keras_h5(path: str) -> dict:
    """Read a keras InceptionV3 .h5 weight file into our npz mapping.

    Handles both historical naming bases: the downloadable
    ``inception_v3_weights_tf_dim_ordering_tf_kernels[_notop].h5`` files use
    ``conv2d_1..conv2d_94``; models saved from modern keras use
    ``conv2d, conv2d_1, ..`` (0-based, unsuffixed first)."""
    import h5py

    flat = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                flat[name] = np.asarray(obj)

        root.visititems(visit)

    def collect(layer: str, leaf: str) -> dict[int, np.ndarray]:
        """index -> array for datasets under ``<layer>[_N]/...<leaf>``."""
        found = {}
        pat = re.compile(rf"(?:^|/){layer}(?:_(\d+))?/.*{leaf}")
        for name, arr in flat.items():
            m = pat.search(name)
            if m:
                found[int(m.group(1) or 0)] = arr
        return found

    kernels = collect("conv2d", "kernel")
    betas = collect("batch_normalization", "beta")
    means = collect("batch_normalization", "moving_mean")
    variances = collect("batch_normalization", "moving_variance")
    gammas = collect("batch_normalization", "gamma")  # absent: scale=False
    if not kernels:
        raise SystemExit(f"{path}: no conv2d kernels found — not a keras weight file?")
    base = min(kernels)  # 0-based (modern) or 1-based (downloaded files)
    convs, bns = [], []
    for i in range(base, base + len(kernels)):
        if i not in kernels or i not in betas:
            raise SystemExit(f"{path}: missing conv2d/bn index {i} (base {base})")
        convs.append(kernels[i])
        bns.append((gammas.get(i), betas[i], means[i], variances[i]))
    fc = None
    fc_kernel = [a for n, a in flat.items() if "predictions" in n and n.endswith("kernel:0") or ("predictions" in n and n.endswith("/kernel"))]
    fc_bias = [a for n, a in flat.items() if "predictions" in n and (n.endswith("bias:0") or n.endswith("/bias"))]
    if fc_kernel and fc_bias:
        fc = (fc_kernel[0], fc_bias[0])
    return convert_keras_arrays(convs, bns, fc)


def load_keras_savedmodel(path: str) -> dict:
    """Read a TF SavedModel / .keras model holding a keras InceptionV3.

    Loads through keras (trusted files only — a SavedModel can run code on
    load). NOTE ``model.layers`` of a functional model is TOPOLOGICALLY
    sorted, not creation-ordered — the creation order keras_order() maps
    against lives in the ``conv2d_N`` / ``batch_normalization_N`` layer
    NAMES, so layers are re-sorted by their name index."""
    import tensorflow as tf

    model = tf.keras.models.load_model(path, compile=False)
    convs_by_idx, bns_by_idx, fc = {}, {}, None

    def name_idx(name: str, stem: str) -> int:
        rest = name[len(stem):]
        return int(rest[1:]) if rest.startswith("_") else 0

    for layer in model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D" and layer.name.startswith("conv2d"):
            convs_by_idx[name_idx(layer.name, "conv2d")] = layer.get_weights()[0]
        elif cls == "BatchNormalization" and layer.name.startswith("batch_normalization"):
            ws = layer.get_weights()
            if layer.scale:
                gamma, beta, mean, var = ws
            else:
                gamma, (beta, mean, var) = None, ws
            bns_by_idx[name_idx(layer.name, "batch_normalization")] = (gamma, beta, mean, var)
        elif cls == "Dense" and layer.name == "predictions":
            fc = tuple(layer.get_weights())
    for label, by_idx in (("conv2d", convs_by_idx), ("batch_normalization", bns_by_idx)):
        if by_idx:
            base = min(by_idx)
            missing = [i for i in range(base, base + len(by_idx)) if i not in by_idx]
            if missing:
                raise SystemExit(
                    f"{path}: missing {label} index {missing[0]} (base {base}) "
                    "— not a plain InceptionV3 layer numbering?"
                )
    convs = [convs_by_idx[i] for i in sorted(convs_by_idx)]
    bns = [bns_by_idx[i] for i in sorted(bns_by_idx)]
    return convert_keras_arrays(convs, bns, fc)


# cache locations a no-egress container might still carry weights in
_CACHE_GLOBS = (
    "~/.cache/torch/hub/checkpoints/*.pth",
    "~/.cache/torch/checkpoints/*.pth",
    "~/.torch/models/*.pth",
    "~/.keras/models/*.h5",
    "~/.cache/keras/models/*.h5",
    "~/.cache/huggingface/hub/**/*.bin",
    "~/.cache/huggingface/hub/**/*.h5",
)


def probe_weight_caches(verbose: bool = True) -> list[str]:
    """Search the standard local weight caches for InceptionV3-ish files.

    Zero-egress containers sometimes ship a torch/keras download cache even
    though they can't fetch; this says exactly what exists so runbook step 1
    (docs/fid_real_weights.md) starts from facts."""
    import glob as _glob

    hits, seen = [], []
    for pattern in _CACHE_GLOBS:
        for path in sorted(_glob.glob(os.path.expanduser(pattern), recursive=True)):
            seen.append(path)
            if "inception" in os.path.basename(path).lower():
                hits.append(path)
    if verbose:
        if hits:
            print("InceptionV3 candidates found:")
            for h in hits:
                tag = (
                    "  <- pytorch-FID FIDInception (published-FID standard)"
                    if "pt_inception" in os.path.basename(h).lower()
                    else ""
                )
                print(f"  {h}  ({os.path.getsize(h)/1e6:.1f} MB){tag}")
            best = next(
                (h for h in hits if "pt_inception" in os.path.basename(h).lower()),
                hits[0],
            )
            print(f"next: python scripts/convert_inception.py {best} inception_fid.npz")
        elif seen:
            print("cached model files found, none named like inception:")
            for s in seen[:20]:
                print(f"  {s}")
        else:
            print(
                "no cached model weights in "
                + ", ".join(p.split("/*")[0] for p in _CACHE_GLOBS[:5])
                + " — obtain a torchvision .pth or keras .h5 out of band "
                "(docs/fid_real_weights.md)"
            )
    return hits


def load_state_dict(src: str, allow_full_unpickle: bool = False) -> dict:
    """Load a torchvision state_dict from a .pth (torch) or a .npz holding
    the same key->array mapping (lets the conversion path be validated
    in environments without torch checkpoints).

    ``weights_only=True`` is the only default load path: full unpickling
    executes arbitrary code from the checkpoint file, so it requires the
    explicit ``--allow-full-unpickle`` opt-in (never an automatic retry)."""
    if src.endswith(".npz"):
        with np.load(src) as z:
            return {k: z[k] for k in z.files}
    import torch

    try:
        sd = torch.load(src, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_full_unpickle:
            raise SystemExit(
                f"weights-only load failed ({type(e).__name__}: {e}).\n"
                "Full-module checkpoints need unrestricted unpickling, which "
                "EXECUTES CODE from the file. If you trust this checkpoint, "
                "re-run with --allow-full-unpickle."
            )
        print("weights-only load failed; full unpickle (explicitly allowed)", file=sys.stderr)
        sd = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def convert_any(src: str, allow_full_unpickle: bool = False, variant: str = "auto") -> dict:
    """Dispatch on the source format; returns the npz mapping.

    The keras paths are always torchvision-lineage pooling (keras
    .applications has no FIDInception port); ``variant`` only affects the
    torch/.npz state_dict path."""
    if os.path.isdir(src) or src.endswith(".keras"):
        return load_keras_savedmodel(src)
    if src.endswith((".h5", ".hdf5")):
        return load_keras_h5(src)
    return convert(load_state_dict(src, allow_full_unpickle), variant=variant)


def main() -> int:
    argv = list(sys.argv[1:])
    allow_full = "--allow-full-unpickle" in argv
    if allow_full:
        argv.remove("--allow-full-unpickle")
    variant = "auto"
    if "--variant" in argv:
        i = argv.index("--variant")
        if i + 1 >= len(argv):
            print("ERROR: --variant needs a value (auto|tv|fid2015)", file=sys.stderr)
            return 2
        variant = argv[i + 1]
        del argv[i : i + 2]
    if "--probe" in argv:
        probe_weight_caches()
        return 0
    if len(argv) != 2:
        print(__doc__)
        probe_weight_caches()
        return 2
    src, dst = argv
    if not os.path.exists(src):
        print(f"ERROR: {src} does not exist; probing local caches instead:", file=sys.stderr)
        probe_weight_caches()
        return 2
    out = convert_any(src, allow_full, variant=variant)
    np.savez_compressed(dst, **out)
    n_blocks = sum(1 for k in out if k.endswith("/w") and k != "fc/w")
    pool = "FIDInception/pytorch-FID" if "meta/fid2015_pool" in out else "torchvision"
    print(f"converted {n_blocks} conv-bn blocks [{pool} pooling] -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
