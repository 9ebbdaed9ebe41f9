"""Straight-line torch forward of the COMPLETE torchvision InceptionV3.

Ground truth for validating the JAX FID feature extractor
(littlegan_tpu/eval/inception.py) end-to-end without a downloaded
checkpoint: this module consumes the raw torchvision-format state_dict
(``scripts/convert_inception.py::synthetic_state_dict`` — exact key names
and OIHW shapes) and runs the full network with torch's own kernels
(F.conv2d / F.max_pool2d / F.avg_pool2d with count_include_pad=True,
eval-mode F.batch_norm at eps=1e-3, torchvision's exact block wiring and
branch-concat order).

The reference network this transcribes is torchvision's ``inception_v3``
(the standard the repo pins FID to, see eval/inception.py docstring); the
reference project runs the analogous extraction via a frozen 2015 GraphDef
(/root/reference/fid.py:36-42,102).

Perturbation knobs (``Mutation``) let the parity tests prove their own
sensitivity: each knob re-introduces one of the silent conversion bugs the
round-2 verdict called out (swapped branch-concat order, wrong
count_include_pad, wrong stem padding, wrong pool window) and the
corresponding test asserts the comparison FAILS under it.
"""

from __future__ import annotations

import dataclasses

import torch
import torch.nn.functional as F


@dataclasses.dataclass(frozen=True)
class Mutation:
    """Structural perturbations; all-off == faithful torchvision forward.

    ``fid_pool=True`` is not a perturbation but the pytorch-FID
    **FIDInception** variant (pt_inception-2015 checkpoints): InceptionA/
    C/E_1 branch-pool avg-pools run count_include_pad=False and E_2
    (Mixed_7c) pools its branch with max_pool2d(3, stride=1, padding=1) —
    the exact block patches pytorch_fid/inception.py applies on top of
    torchvision's InceptionV3."""

    swap_concat_5b: bool = False        # InceptionA Mixed_5b branch order
    avgpool_exclude_pad: bool = False   # count_include_pad=False everywhere
    stem_c3_pad0: bool = False          # Conv2d_2b_3x3 padding 1 -> 0 (breaks shapes downstream? no: VALID just shrinks)
    maxpool_window2: bool = False       # stem/grid maxpool 3x3 -> 2x2
    fid_pool: bool = False              # FIDInception pooling (see above)


def _conv_bn(sd, prefix: str, x, stride=1, padding=0):
    """BasicConv2d: conv(no bias) + eval-mode BN(eps=1e-3) + relu."""
    y = F.conv2d(x, sd[f"{prefix}.conv.weight"], stride=stride, padding=padding)
    y = F.batch_norm(
        y,
        sd[f"{prefix}.bn.running_mean"],
        sd[f"{prefix}.bn.running_var"],
        sd[f"{prefix}.bn.weight"],
        sd[f"{prefix}.bn.bias"],
        training=False,
        eps=1e-3,
    )
    return F.relu(y)


def _avgpool(x, mut: Mutation):
    include = not (mut.avgpool_exclude_pad or mut.fid_pool)
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=include)


def _maxpool(x, mut: Mutation):
    return F.max_pool2d(x, 2 if mut.maxpool_window2 else 3, stride=2)


def _inception_a(sd, tv: str, x, mut: Mutation, swap: bool = False):
    b1 = _conv_bn(sd, f"{tv}.branch1x1", x)
    b5 = _conv_bn(sd, f"{tv}.branch5x5_1", x)
    b5 = _conv_bn(sd, f"{tv}.branch5x5_2", b5, padding=2)
    b3 = _conv_bn(sd, f"{tv}.branch3x3dbl_1", x)
    b3 = _conv_bn(sd, f"{tv}.branch3x3dbl_2", b3, padding=1)
    b3 = _conv_bn(sd, f"{tv}.branch3x3dbl_3", b3, padding=1)
    bp = _conv_bn(sd, f"{tv}.branch_pool", _avgpool(x, mut))
    branches = [b5, b1, b3, bp] if swap else [b1, b5, b3, bp]
    return torch.cat(branches, dim=1)


def _inception_b(sd, tv: str, x, mut: Mutation):
    b3 = _conv_bn(sd, f"{tv}.branch3x3", x, stride=2)
    bd = _conv_bn(sd, f"{tv}.branch3x3dbl_1", x)
    bd = _conv_bn(sd, f"{tv}.branch3x3dbl_2", bd, padding=1)
    bd = _conv_bn(sd, f"{tv}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, _maxpool(x, mut)], dim=1)


def _inception_c(sd, tv: str, x, mut: Mutation):
    b1 = _conv_bn(sd, f"{tv}.branch1x1", x)
    b7 = _conv_bn(sd, f"{tv}.branch7x7_1", x)
    b7 = _conv_bn(sd, f"{tv}.branch7x7_2", b7, padding=(0, 3))
    b7 = _conv_bn(sd, f"{tv}.branch7x7_3", b7, padding=(3, 0))
    bd = _conv_bn(sd, f"{tv}.branch7x7dbl_1", x)
    bd = _conv_bn(sd, f"{tv}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _conv_bn(sd, f"{tv}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _conv_bn(sd, f"{tv}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _conv_bn(sd, f"{tv}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _conv_bn(sd, f"{tv}.branch_pool", _avgpool(x, mut))
    return torch.cat([b1, b7, bd, bp], dim=1)


def _inception_d(sd, tv: str, x, mut: Mutation):
    b3 = _conv_bn(sd, f"{tv}.branch3x3_1", x)
    b3 = _conv_bn(sd, f"{tv}.branch3x3_2", b3, stride=2)
    b7 = _conv_bn(sd, f"{tv}.branch7x7x3_1", x)
    b7 = _conv_bn(sd, f"{tv}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _conv_bn(sd, f"{tv}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _conv_bn(sd, f"{tv}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, _maxpool(x, mut)], dim=1)


def _inception_e(sd, tv: str, x, mut: Mutation, e2: bool = False):
    b1 = _conv_bn(sd, f"{tv}.branch1x1", x)
    b3 = _conv_bn(sd, f"{tv}.branch3x3_1", x)
    b3 = torch.cat(
        [
            _conv_bn(sd, f"{tv}.branch3x3_2a", b3, padding=(0, 1)),
            _conv_bn(sd, f"{tv}.branch3x3_2b", b3, padding=(1, 0)),
        ],
        dim=1,
    )
    bd = _conv_bn(sd, f"{tv}.branch3x3dbl_1", x)
    bd = _conv_bn(sd, f"{tv}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat(
        [
            _conv_bn(sd, f"{tv}.branch3x3dbl_3a", bd, padding=(0, 1)),
            _conv_bn(sd, f"{tv}.branch3x3dbl_3b", bd, padding=(1, 0)),
        ],
        dim=1,
    )
    if e2 and mut.fid_pool:
        # FIDInceptionE_2: max-pool branch (matches the original 2015 graph)
        pooled = F.max_pool2d(x, 3, stride=1, padding=1)
    else:
        pooled = _avgpool(x, mut)
    bp = _conv_bn(sd, f"{tv}.branch_pool", pooled)
    return torch.cat([b1, b3, bd, bp], dim=1)


@torch.no_grad()
def torch_inception_features(
    state_dict: dict,
    images_nhwc_0_255,
    mutation: Mutation = Mutation(),
) -> "torch.Tensor":
    """[0,255] NHWC float images -> (N, 2048) pool features, all-torch.

    Mirrors eval/inception.py::inception_features's contract: bilinear
    resize to 299 (half-pixel centers == align_corners=False), scale to
    [-1,1], full network, global average pool.
    """
    mut = mutation
    sd = {k: torch.as_tensor(v) for k, v in state_dict.items()}
    x = torch.as_tensor(images_nhwc_0_255, dtype=torch.float32).permute(0, 3, 1, 2)
    if x.shape[2] != 299 or x.shape[3] != 299:
        x = F.interpolate(x, size=(299, 299), mode="bilinear", align_corners=False)
    x = x / 127.5 - 1.0

    x = _conv_bn(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _conv_bn(sd, "Conv2d_2a_3x3", x)
    x = _conv_bn(sd, "Conv2d_2b_3x3", x, padding=0 if mut.stem_c3_pad0 else 1)
    x = _maxpool(x, mut)
    x = _conv_bn(sd, "Conv2d_3b_1x1", x)
    x = _conv_bn(sd, "Conv2d_4a_3x3", x)
    x = _maxpool(x, mut)
    x = _inception_a(sd, "Mixed_5b", x, mut, swap=mut.swap_concat_5b)
    x = _inception_a(sd, "Mixed_5c", x, mut)
    x = _inception_a(sd, "Mixed_5d", x, mut)
    x = _inception_b(sd, "Mixed_6a", x, mut)
    x = _inception_c(sd, "Mixed_6b", x, mut)
    x = _inception_c(sd, "Mixed_6c", x, mut)
    x = _inception_c(sd, "Mixed_6d", x, mut)
    x = _inception_c(sd, "Mixed_6e", x, mut)
    x = _inception_d(sd, "Mixed_7a", x, mut)
    x = _inception_e(sd, "Mixed_7b", x, mut)
    x = _inception_e(sd, "Mixed_7c", x, mut, e2=True)
    return x.mean(dim=(2, 3))  # adaptive_avg_pool2d((1,1)) -> (N, 2048)
