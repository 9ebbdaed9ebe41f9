"""Convert torchvision InceptionV3 weights to littlegan-tpu's FID npz format.

The reference pins FID to a 2015 frozen InceptionV3 GraphDef downloaded at
runtime (fid.py:273-288). This environment has zero egress, so conversion is
offline: point this script at a torchvision ``inception_v3`` checkpoint
(.pth state_dict, the standard pytorch-FID weights) and it emits the npz
consumed by ``Config.fid_weights`` / eval/inception.py.

Usage: python scripts/convert_inception.py /path/to/inception_v3.pth out.npz
       (add --allow-full-unpickle ONLY for trusted full-module checkpoints
        that fail the safe weights_only load — full unpickling runs code
        from the file)

Mapping: torchvision module names -> our layer names; conv weights are
transposed OIHW -> HWIO; each BatchNorm is folded into an affine
(scale, offset) pair: scale = gamma / sqrt(var + eps), offset = beta -
mean * scale (eps = 1e-3, torchvision's value).
"""

from __future__ import annotations

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


def convert(state_dict, eps: float = 1e-3) -> dict:
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
    # classifier head (torchvision fc: (1000, 2048) + bias) — not used by
    # FID's pool features, but Inception Score needs the class logits
    if "fc.weight" in state_dict:
        out["fc/w"] = np.transpose(get("fc.weight"), (1, 0)).astype(np.float32)
        out["fc/b"] = get("fc.bias").astype(np.float32)
    else:  # pragma: no cover - partial dumps only
        print("NOTE: state_dict has no fc.weight — Inception Score unavailable", file=sys.stderr)
    return out


def synthetic_state_dict(seed: int = 0) -> dict:
    """Random-valued state_dict with torchvision ``inception_v3``'s exact key
    names and tensor shapes (conv weights OIHW, BN vectors), He-scaled so a
    full forward stays finite. Validates the conversion path in-tree — name
    mapping, OIHW->HWIO transpose, BN folding — without a downloaded
    checkpoint (this container has no egress and no torchvision)."""
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
    sd["fc.weight"] = rng.normal(0, np.sqrt(1.0 / 2048), (1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(0, 0.01, (1000,)).astype(np.float32)
    return sd


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


def main() -> int:
    argv = list(sys.argv[1:])
    allow_full = "--allow-full-unpickle" in argv
    if allow_full:
        argv.remove("--allow-full-unpickle")
    if len(argv) != 2:
        print(__doc__)
        return 2
    src, dst = argv
    np.savez_compressed(dst, **convert(load_state_dict(src, allow_full)))
    print(f"converted {len(_NAME_MAP)} conv-bn blocks -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
