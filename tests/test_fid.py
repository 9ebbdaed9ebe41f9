"""FID stack tests: Fréchet-distance golden values vs closed forms, scipy
agreement, Newton–Schulz device path, inception extractor shapes, and the
two-mode eval driver on synthetic images (SURVEY §4)."""

import os

import numpy as np
import pytest

from littlegan_tpu.eval.fid import (
    activation_statistics,
    frechet_distance,
    frechet_distance_newton_schulz,
)


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(32, 8))
    sigma = np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_mean_shift_golden():
    # identical covariance, mean shift d -> FID = |d|^2 exactly
    sigma = np.eye(4)
    mu1 = np.zeros(4)
    mu2 = np.array([1.0, 2.0, 0.0, -1.0])
    assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(6.0, abs=1e-8)


def test_frechet_diagonal_golden():
    # diagonal covariances: closed form sum((sqrt(s1)-sqrt(s2))^2) + |dmu|^2
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([4.0, 1.0, 1.0])
    want = (1 - 2) ** 2 + (2 - 1) ** 2 + (3 - 1) ** 2
    assert frechet_distance(np.zeros(3), s1, np.zeros(3), s2) == pytest.approx(want, abs=1e-6)


def test_frechet_singular_fallback():
    # rank-deficient covariance exercises the eps-offset retry (fid.py:131-136)
    s1 = np.zeros((3, 3))
    s1[0, 0] = 1.0
    s2 = np.eye(3)
    d = frechet_distance(np.zeros(3), s1, np.zeros(3), s2)
    assert np.isfinite(d) and d > 0


def test_newton_schulz_matches_scipy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(64, 16))
    b = rng.normal(size=(64, 16))
    mu1, s1 = activation_statistics(a)
    mu2, s2 = activation_statistics(b)
    host = frechet_distance(mu1, s1, mu2, s2)
    dev = frechet_distance_newton_schulz(mu1, s1, mu2, s2)
    assert abs(host - dev) / max(abs(host), 1e-9) < 5e-3


def test_activation_statistics():
    rng = np.random.default_rng(2)
    f = rng.normal(size=(100, 5))
    mu, sigma = activation_statistics(f)
    np.testing.assert_allclose(mu, f.mean(0))
    np.testing.assert_allclose(sigma, np.cov(f, rowvar=False))


@pytest.mark.slow
def test_inception_features_shape():
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features, init_inception_params

    params = init_inception_params("", seed=0)
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3)), jnp.float32)
    feats = inception_features(params, imgs)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    # deterministic across param rebuilds (fixed seed)
    params2 = init_inception_params("", seed=0)
    feats2 = inception_features(params2, imgs)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


@pytest.mark.slow
def test_eval_driver_two_modes(tmp_path, tiny_cfg):
    """pre-calculate then calc on synthetic JPEG dirs (evaluate.py both modes)."""
    from PIL import Image

    from littlegan_tpu.eval.evaluate import evaluate_generated, precalculate

    rng = np.random.default_rng(0)
    real_dir = tmp_path / "real"
    gen_dir = tmp_path / "gen"
    real_dir.mkdir(), gen_dir.mkdir()
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            real_dir / f"{i}.jpg"
        )
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            gen_dir / f"{i}.jpg"
        )
    cfg = tiny_cfg.replace(allow_random_fid=True)  # no weights in-container
    stats = tmp_path / "stats.npz"
    log = tmp_path / "fid.log"
    precalculate(cfg, str(real_dir), str(stats), batch_size=8)
    assert stats.exists()
    fid = evaluate_generated(cfg, str(gen_dir), str(stats), str(log), batch_size=8)
    assert np.isfinite(fid)
    # random-init runs are tagged as such in the log, never plain "FID:"
    assert "RANDOM-INIT" in log.read_text()


# ------------------------------------------------- converter validation ----
# Round-1 verdict #2: the torchvision->npz conversion path must be validated
# in-tree (no egress, no torchvision in this container). A synthetic
# state_dict with torchvision's exact names/shapes goes through the real
# converter; the JAX extractor's conv+folded-BN is then checked against
# torch's own functional kernels (ground truth for torchvision semantics).
# This pins the three places conversion silently breaks: the name mapping,
# the OIHW->HWIO transpose, and the BN folding.


def _converter():
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "convert_inception.py"
    spec = importlib.util.spec_from_file_location("convert_inception", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_converter_covers_every_extractor_param():
    """Converted keyset == extractor keyset, shape for shape (both ways:
    a missing or extra mapping entry fails here)."""
    from littlegan_tpu.eval.inception import init_inception_params

    conv = _converter()
    out = conv.convert(conv.synthetic_state_dict(seed=1))
    ref = init_inception_params("", seed=0)
    assert set(out) == set(ref)
    for k in out:
        assert out[k].shape == ref[k].shape, k


def test_converter_conv_bn_matches_torch():
    """_conv_bn over converted params == torch conv2d+batch_norm(eval)+relu
    on the raw state_dict, for one layer of each conv/padding shape class."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from littlegan_tpu.eval.inception import _conv_bn

    conv = _converter()
    sd = conv.synthetic_state_dict(seed=2)
    params = conv.convert(sd)
    rng = np.random.default_rng(3)

    # (ours, stride, jax padding, torch padding) — torchvision's conventions
    cases = [
        ("stem/c1", 2, "VALID", 0),        # 3x3 s2 (stem downsample)
        ("stem/c3", 1, "SAME", 1),         # 3x3 s1 pad 1
        ("stem/c4", 1, "VALID", 0),        # 1x1
        ("mix5b/b5x5_2", 1, "SAME", 2),    # 5x5 pad 2
        ("mix6b/b7_2", 1, "SAME", (0, 3)), # 1x7 pad (0,3)
        ("mix6b/bd_2", 1, "SAME", (3, 0)), # 7x1 pad (3,0)
    ]
    from littlegan_tpu.eval.inception import _conv_specs

    spec = {n: (kh, kw, cin, cout) for n, kh, kw, cin, cout in _conv_specs()}
    for ours, stride, jpad, tpad in cases:
        tv = conv._NAME_MAP[ours]
        kh, kw, cin, _ = spec[ours]
        x = rng.normal(0, 1, (2, 9, 9, cin)).astype(np.float32)

        got = np.asarray(_conv_bn(jnp.asarray(x), params, ours, stride=stride, padding=jpad))

        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))  # NHWC -> NCHW
        y = F.conv2d(xt, torch.tensor(sd[f"{tv}.conv.weight"]), stride=stride, padding=tpad)
        y = F.batch_norm(
            y,
            torch.tensor(sd[f"{tv}.bn.running_mean"]),
            torch.tensor(sd[f"{tv}.bn.running_var"]),
            torch.tensor(sd[f"{tv}.bn.weight"]),
            torch.tensor(sd[f"{tv}.bn.bias"]),
            training=False,
            eps=1e-3,
        )
        want = np.transpose(F.relu(y).numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, err_msg=ours)


@pytest.mark.slow
def test_converted_weights_drive_full_extractor(tmp_path):
    """End-to-end: synthetic .npz state_dict -> converter CLI -> extractor
    loads it, produces finite features that differ from the random-init path
    (catches silently-ignored weight files)."""
    import subprocess
    import sys as _sys

    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features, init_inception_params

    conv = _converter()
    src = tmp_path / "tv_state.npz"
    dst = tmp_path / "fid_weights.npz"
    np.savez_compressed(src, **conv.synthetic_state_dict(seed=4))
    script = str(conv.__file__ if hasattr(conv, "__file__") else "")
    proc = subprocess.run(
        [_sys.executable, script or "scripts/convert_inception.py", str(src), str(dst)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    loaded = init_inception_params(str(dst))
    imgs = jnp.asarray(np.random.default_rng(5).integers(0, 255, (2, 64, 64, 3)), jnp.float32)
    feats = np.asarray(inception_features(loaded, imgs))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
    rand_feats = np.asarray(inception_features(init_inception_params("", seed=0), imgs))
    assert np.abs(feats - rand_feats).max() > 1e-3


# ------------------------------------ full-network torch parity (r3 #1) ----
# Round-2 verdict #1: block-level _conv_bn parity (above) cannot catch a
# swapped branch-concat order, a wrong pool count_include_pad, or a stem
# padding error. These tests pin the ENTIRE extractor against a straight-line
# torch transcription of torchvision's InceptionV3 (tests/torch_inception_ref
# .py) driven directly by the raw synthetic state_dict — and prove their own
# sensitivity by asserting the comparison FAILS under each of those exact
# structural mutations.

_PARITY_RTOL = 1e-3
_PARITY_ATOL = 1e-3


@pytest.fixture(scope="module")
def inception_pair():
    """(state_dict, converted jax params, 299 input, 128 input, jax feats)."""
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features

    conv = _converter()
    sd = conv.synthetic_state_dict(seed=6)
    params = conv.convert(sd)
    rng = np.random.default_rng(7)
    img299 = rng.integers(0, 256, (1, 299, 299, 3)).astype(np.float32)
    img128 = rng.integers(0, 256, (1, 128, 128, 3)).astype(np.float32)
    f299 = np.asarray(inception_features(params, jnp.asarray(img299)))
    f128 = np.asarray(inception_features(params, jnp.asarray(img128)))
    return sd, params, img299, img128, f299, f128


@pytest.mark.slow
def test_full_network_matches_torch_299(inception_pair):
    """JAX extractor == torch full-network forward on a native 299x299 input
    (no resize in play): stem geometry, pool semantics, block wiring, branch
    order, global average pool — everything end-to-end."""
    from tests.torch_inception_ref import torch_inception_features

    sd, _, img299, _, f299, _ = inception_pair
    want = torch_inception_features(sd, img299).numpy()
    np.testing.assert_allclose(f299, want, rtol=_PARITY_RTOL, atol=_PARITY_ATOL)


@pytest.mark.slow
def test_full_network_matches_torch_128_preprocessing(inception_pair):
    """Same, via the full preprocessing path (bilinear 128->299 resize with
    half-pixel centers + [-1,1] scaling) — the geometry every FID eval of
    this model family actually exercises."""
    from tests.torch_inception_ref import torch_inception_features

    sd, _, _, img128, _, f128 = inception_pair
    want = torch_inception_features(sd, img128).numpy()
    np.testing.assert_allclose(f128, want, rtol=_PARITY_RTOL, atol=_PARITY_ATOL)


@pytest.mark.slow
def test_full_network_matches_torch_512_downsample(inception_pair):
    """DOWNsampling parity (512->299): torch F.interpolate(bilinear) does not
    antialias, so the JAX resize must run antialias=False — jax.image.resize's
    antialias=True default diverges exactly here (and only here: antialias is
    a no-op for upsampling). Guards FID comparability for >299px evals (the
    512² campaigns)."""
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features
    from tests.torch_inception_ref import torch_inception_features

    sd, params = inception_pair[0], inception_pair[1]
    img512 = np.random.default_rng(8).integers(0, 256, (1, 512, 512, 3)).astype(np.float32)
    got = np.asarray(inception_features(params, jnp.asarray(img512)))
    want = torch_inception_features(sd, img512).numpy()
    np.testing.assert_allclose(got, want, rtol=_PARITY_RTOL, atol=_PARITY_ATOL)


@pytest.mark.slow
@pytest.mark.parametrize(
    "mutation",
    ["swap_concat_5b", "avgpool_exclude_pad", "stem_c3_pad0", "maxpool_window2"],
)
def test_full_network_parity_detects_mutations(inception_pair, mutation):
    """Sensitivity proof: each single structural perturbation of the torch
    reference (swapped branch concat, count_include_pad=False, stem padding,
    pool window) pushes the features OUTSIDE the parity tolerance, so the
    tests above would catch the equivalent bug in the JAX extractor."""
    from tests.torch_inception_ref import Mutation, torch_inception_features

    sd, _, img299, _, f299, _ = inception_pair
    mutated = torch_inception_features(
        sd, img299, Mutation(**{mutation: True})
    ).numpy()
    err = np.abs(f299 - mutated) / (np.abs(mutated) + _PARITY_ATOL)
    assert err.max() > 10 * _PARITY_RTOL, (
        f"mutation {mutation} not detectable at parity tolerance "
        f"(max rel err {err.max():.2e}) — the parity test has a blind spot"
    )


def test_evaluate_refuses_random_fid_without_optin(tmp_path, tiny_cfg):
    """fid_weights unset + allow_random_fid unset -> hard refusal (round-1
    verdict: no code path may print an uncomparable number labeled FID)."""
    from PIL import Image

    from littlegan_tpu.eval.evaluate import precalculate

    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "0.jpg")
    cfg = tiny_cfg.replace(allow_random_fid=False)
    with pytest.raises(RuntimeError, match="allow_random_fid"):
        precalculate(cfg, str(d), str(tmp_path / "s.npz"), batch_size=4)


def test_load_images_center_crops_nonsquare(tmp_path):
    """Eval-time image loading must center-crop non-square files (same
    geometry as the training pipeline), not squash them."""
    from PIL import Image

    from littlegan_tpu.eval.evaluate import _load_images

    # 16x32 image: top half black, bottom half white -> center crop keeps the
    # middle band; a squashing resize would keep both extremes at the edges
    arr = np.zeros((32, 16, 3), np.uint8)
    arr[16:] = 255
    p = tmp_path / "tall.png"
    Image.fromarray(arr).save(p)
    out = _load_images([str(p)], dim=16)
    assert out.shape == (1, 16, 16, 3)
    assert out[0, 0].mean() == 0 and out[0, -1].mean() == 255  # crop keeps the
    # transition inside the frame (squash would too, but the crop is exact:
    # row 7 black, row 8 white)
    assert out[0, 7].mean() == 0 and out[0, 8].mean() == 255


# ------------------------------------------------ real-weights runbook ----
# docs/fid_real_weights.md: the moment a container holds a real torchvision
# inception_v3 checkpoint, convert -> fid_weights -> evaluate must run
# unmodified. The chain is dry-run here on every pass with the synthetic
# state_dict; the gated test below runs the identical chain on real weights
# when LITTLEGAN_FID_WEIGHTS is set.


def _run_weights_chain(tmp_path, tiny_cfg, src_path):
    """convert -> load as fid_weights -> precalculate + evaluate_generated."""
    import subprocess
    import sys as _sys

    from PIL import Image

    from littlegan_tpu.eval.evaluate import evaluate_generated, precalculate

    dst = tmp_path / "fid_weights.npz"
    proc = subprocess.run(
        [_sys.executable, "scripts/convert_inception.py", str(src_path), str(dst)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr

    rng = np.random.default_rng(0)
    real_dir, gen_dir = tmp_path / "real", tmp_path / "gen"
    real_dir.mkdir(), gen_dir.mkdir()
    for i in range(8):
        for d in (real_dir, gen_dir):
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
                d / f"{i}.jpg"
            )
    # real weights present -> NO allow_random_fid needed, plain FID label
    cfg = tiny_cfg.replace(fid_weights=str(dst), allow_random_fid=False)
    stats, log = tmp_path / "stats.npz", tmp_path / "fid.log"
    precalculate(cfg, str(real_dir), str(stats), batch_size=8)
    fid = evaluate_generated(cfg, str(gen_dir), str(stats), str(log), batch_size=8)
    assert np.isfinite(fid)
    text = log.read_text()
    assert "RANDOM-INIT" not in text and "FID" in text
    return dst


@pytest.mark.slow
def test_runbook_dry_run_synthetic_weights(tmp_path, tiny_cfg):
    """The full runbook chain on the synthetic torchvision-format state_dict
    (keeps docs/fid_real_weights.md from rotting while no real checkpoint
    exists in-container)."""
    conv = _converter()
    src = tmp_path / "tv_state.npz"
    np.savez_compressed(src, **conv.synthetic_state_dict(seed=9))
    _run_weights_chain(tmp_path, tiny_cfg, src)


@pytest.mark.slow
def test_real_weights_runbook(tmp_path, tiny_cfg):
    """Gated on LITTLEGAN_FID_WEIGHTS (a real torchvision inception_v3 .pth
    or .npz): runs the identical chain, then writes/compares the golden
    feature fixture (tests/golden_inception_features.npz — commit it on
    first success, see docs/fid_real_weights.md)."""
    import pathlib

    import jax.numpy as jnp

    src = os.environ.get("LITTLEGAN_FID_WEIGHTS", "")
    if not src or not os.path.isfile(src):
        pytest.skip("LITTLEGAN_FID_WEIGHTS not set (no real checkpoint in-container)")

    from littlegan_tpu.eval.inception import inception_features, init_inception_params

    dst = _run_weights_chain(tmp_path, tiny_cfg, src)
    params = init_inception_params(str(dst))
    imgs = jnp.asarray(
        np.random.default_rng(42).integers(0, 256, (2, 299, 299, 3)), jnp.float32
    )
    feats = np.asarray(inception_features(params, imgs))
    golden = pathlib.Path(__file__).parent / "golden_inception_features.npz"
    if golden.is_file():
        with np.load(golden) as z:
            np.testing.assert_allclose(feats, z["features"], rtol=1e-3, atol=1e-3)
    else:
        np.savez_compressed(golden, features=feats)
        print(f"wrote golden fixture {golden} — commit it")


@pytest.mark.slow
def test_eval_cli_two_modes(tmp_path, monkeypatch):
    """The standalone eval CLI (reference evaluate.py parity): pre-calculate
    writes the stats npz; any other mode is calc (the reference quirk,
    evaluate.py:27,43) and appends to the log. Config comes from cwd files."""
    import json as _json

    from PIL import Image

    from littlegan_tpu.eval.evaluate import main as eval_main

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(d / f"{i}.jpg")
    (tmp_path / "sample.config.json").write_text(
        _json.dumps({
            "batch_size": 4, "image_dim": 16, "init_dim": 1, "noise_dim": 13,
            "attr": [0, 1, 2, 3, 4, 5, 6], "conv_filter": [24, 16, 12, 8, 4],
            "allow_random_fid": True, "debug": True,
        })
    )
    monkeypatch.chdir(tmp_path)
    stats, log = tmp_path / "s.npz", tmp_path / "fid.log"
    assert eval_main(["pre-calculate", str(d), str(stats)]) == 0
    assert stats.exists()
    # "anything-else-is-calc" quirk: mode string "calculate" runs calc
    assert eval_main(["calculate", str(d), str(stats), "", str(log)]) == 0
    assert "RANDOM-INIT" in log.read_text()


# --------------------------------------------------- Inception Score -------


def test_inception_score_golden():
    """Closed-form anchors: uniform rows -> IS=1; N one-hot rows evenly
    covering C classes (single split) -> IS=C."""
    from littlegan_tpu.eval.inception_score import inception_score

    uniform = np.full((40, 10), 0.1)
    m, s = inception_score(uniform, splits=4)
    assert abs(m - 1.0) < 1e-9 and s < 1e-12

    one_hot = np.eye(8)[np.arange(32) % 8]
    m, s = inception_score(one_hot, splits=1)
    assert abs(m - 8.0) < 1e-6

    # sharper conditionals with the same marginal -> strictly higher IS
    soft = np.full((32, 8), 0.02 / 7) + one_hot * (0.98 - 0.02 / 7)
    m_soft, _ = inception_score(soft, splits=1)
    assert 1.0 < m_soft < 8.0

    with pytest.raises(ValueError, match=r"\(N, C\)"):
        inception_score(np.ones((0, 5)))


def test_class_probs_match_torch_fc():
    """Converted fc head == torch's eval-mode classifier (dropout-free
    F.linear + softmax) on the same pool features."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from littlegan_tpu.eval.inception import class_probs_from_features

    conv = _converter()
    sd = conv.synthetic_state_dict(seed=3)
    params = conv.convert(sd)
    feats = np.random.default_rng(0).normal(size=(5, 2048)).astype(np.float32)

    ours = class_probs_from_features(params, feats)
    want = F.softmax(
        F.linear(
            torch.as_tensor(feats),
            torch.as_tensor(sd["fc.weight"]),
            torch.as_tensor(sd["fc.bias"]),
        ),
        dim=1,
    ).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ours.sum(axis=1), 1.0, rtol=1e-9)

    # pre-fc-era weight files must fail loudly, not silently skip IS
    legacy = {k: v for k, v in params.items() if not k.startswith("fc/")}
    with pytest.raises(KeyError, match="re-run"):
        class_probs_from_features(legacy, feats)


@pytest.mark.slow
def test_evaluate_with_is_logs_tagged_score(tmp_path, tiny_cfg):
    """with_is=True appends an IS line from the SAME features, tagged
    RANDOM-INIT exactly like FID when no real weights exist."""
    from PIL import Image

    from littlegan_tpu.eval.evaluate import evaluate_generated, precalculate

    rng = np.random.default_rng(1)
    real_dir, gen_dir = tmp_path / "real", tmp_path / "gen"
    real_dir.mkdir(), gen_dir.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            real_dir / f"{i}.jpg"
        )
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            gen_dir / f"{i}.jpg"
        )
    cfg = tiny_cfg.replace(allow_random_fid=True)
    stats, log = tmp_path / "s.npz", tmp_path / "fid.log"
    precalculate(cfg, str(real_dir), str(stats), batch_size=6)
    fid = evaluate_generated(
        cfg, str(gen_dir), str(stats), str(log), batch_size=6, with_is=True
    )
    assert np.isfinite(fid)
    text = log.read_text()
    assert "IS[RANDOM-INIT" in text and "+/-" in text


# ------------------------------------------------------------- KID ---------


def test_kid_math_golden():
    """Unbiased-MMD anchors: same distribution -> ~0 (can dip negative);
    mean-shifted -> clearly positive; brute-force double-sum agreement."""
    from littlegan_tpu.eval.kid import kid, mmd2_unbiased, polynomial_kernel

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 16))
    y = rng.normal(size=(64, 16))
    same_m, _ = kid(x, y, subset_size=64)
    shift_m, _ = kid(x, y + 1.5, subset_size=64)
    # estimator noise at n=64/d=16 is O(0.1); the signal is the separation
    assert abs(same_m) < 0.3
    assert shift_m > 10 * abs(same_m)

    # brute-force cross-check of the estimator on a tiny sample
    a, b = rng.normal(size=(5, 4)), rng.normal(size=(5, 4))
    m = 5
    brute = 0.0
    for i in range(m):
        for j in range(m):
            if i != j:
                brute += polynomial_kernel(a[i : i + 1], a[j : j + 1])[0, 0] / (m * (m - 1))
                brute += polynomial_kernel(b[i : i + 1], b[j : j + 1])[0, 0] / (m * (m - 1))
            brute -= 2 * polynomial_kernel(a[i : i + 1], b[j : j + 1])[0, 0] / (m * m)
    np.testing.assert_allclose(mmd2_unbiased(a, b), brute, rtol=1e-10)

    # subsampled path: deterministic for a seed, std reported
    big_x, big_y = rng.normal(size=(40, 8)), rng.normal(size=(40, 8))
    m1 = kid(big_x, big_y, subset_size=10, n_subsets=8, seed=3)
    m2 = kid(big_x, big_y, subset_size=10, n_subsets=8, seed=3)
    assert m1 == m2 and m1[1] > 0

    with pytest.raises(ValueError, match=">=2"):
        kid(x[:1], y)


@pytest.mark.slow
def test_evaluate_with_kid_needs_saved_features(tmp_path, tiny_cfg):
    """--save-features N embeds raw rows; --kid uses them (tagged), and a
    stats npz without them fails with remediation text."""
    from PIL import Image

    from littlegan_tpu.eval.evaluate import evaluate_generated, precalculate

    rng = np.random.default_rng(2)
    real_dir, gen_dir = tmp_path / "real", tmp_path / "gen"
    real_dir.mkdir(), gen_dir.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            real_dir / f"{i}.jpg"
        )
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            gen_dir / f"{i}.jpg"
        )
    cfg = tiny_cfg.replace(allow_random_fid=True)
    stats, log = tmp_path / "s.npz", tmp_path / "fid.log"
    precalculate(cfg, str(real_dir), str(stats), batch_size=6, save_features=6)
    with np.load(stats) as z:
        assert z["features"].shape == (6, 2048) and z["features"].dtype == np.float16
    fid = evaluate_generated(
        cfg, str(gen_dir), str(stats), str(log), batch_size=6, with_kid=True
    )
    assert np.isfinite(fid)
    assert "KID[RANDOM-INIT" in log.read_text()

    bare = tmp_path / "bare.npz"
    precalculate(cfg, str(real_dir), str(bare), batch_size=6)
    with pytest.raises(ValueError, match="save_features"):
        evaluate_generated(cfg, str(gen_dir), str(bare), str(log), batch_size=6, with_kid=True)


# ------------------------------------------------------------- PRDC --------


def test_prdc_math_golden():
    """k-NN manifold-metric anchors: a set against itself is perfect; far
    disjoint clusters score zero everywhere; a mode-dropping generator keeps
    precision high while recall/coverage fall; brute-force agreement."""
    from littlegan_tpu.eval.prdc import kth_neighbour_radii, pairwise_distances, prdc

    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 8))

    same = prdc(x, x, k=3)
    assert same["precision"] == same["recall"] == same["coverage"] == 1.0
    assert same["density"] >= 1.0  # every point sits in >= k spheres (its own kNN's)

    far = prdc(x, x + 100.0, k=3)
    assert set(far.values()) == {0.0}

    # mode dropping: gen densely covers only the first real cluster
    real = np.concatenate([rng.normal(size=(30, 4)), rng.normal(size=(30, 4)) + 50.0])
    gen = rng.normal(scale=0.5, size=(60, 4))
    drop = prdc(real, gen, k=5)
    assert drop["precision"] > 0.9
    assert drop["recall"] < 0.7 and drop["coverage"] < 0.7

    # brute-force cross-check on a tiny sample (kth excludes self)
    a, b, k = rng.normal(size=(7, 3)), rng.normal(size=(6, 3)), 2
    dist = lambda u, v: float(np.linalg.norm(u - v))
    radii = lambda s: np.array(
        [sorted(dist(s[i], s[j]) for j in range(len(s)) if j != i)[k - 1] for i in range(len(s))]
    )
    ra, rb = radii(a), radii(b)
    brute = {
        "precision": np.mean([any(dist(g, a[j]) <= ra[j] for j in range(len(a))) for g in b]),
        "recall": np.mean([any(dist(r, b[j]) <= rb[j] for j in range(len(b))) for r in a]),
        "density": np.mean([sum(dist(g, a[j]) <= ra[j] for j in range(len(a))) for g in b]) / k,
        "coverage": np.mean([min(dist(a[i], g) for g in b) <= ra[i] for i in range(len(a))]),
    }
    got = prdc(a, b, k=k)
    for name, want in brute.items():
        np.testing.assert_allclose(got[name], want, rtol=1e-12, err_msg=name)
    np.testing.assert_allclose(kth_neighbour_radii(a, k), ra, rtol=1e-12)

    # chunked pairwise distances match the direct form
    big, small = rng.normal(size=(50, 6)), rng.normal(size=(9, 6))
    np.testing.assert_allclose(
        pairwise_distances(big, small, chunk=7),
        np.linalg.norm(big[:, None, :] - small[None, :, :], axis=-1),
        rtol=1e-9,
        atol=1e-12,
    )

    with pytest.raises(ValueError, match="k < n_samples"):
        prdc(a, b, k=6)  # b has only 6 rows


@pytest.mark.slow
def test_evaluate_with_prdc(tmp_path, tiny_cfg):
    """--prdc rides the saved raw features: tagged log line with all four
    values, k auto-lowered for tiny samples, bare npz fails with remediation."""
    from PIL import Image

    from littlegan_tpu.eval.evaluate import evaluate_generated, precalculate

    rng = np.random.default_rng(3)
    real_dir, gen_dir = tmp_path / "real", tmp_path / "gen"
    real_dir.mkdir(), gen_dir.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            real_dir / f"{i}.jpg"
        )
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            gen_dir / f"{i}.jpg"
        )
    cfg = tiny_cfg.replace(allow_random_fid=True)
    stats, log = tmp_path / "s.npz", tmp_path / "fid.log"
    precalculate(cfg, str(real_dir), str(stats), batch_size=6, save_features=6)
    fid = evaluate_generated(
        cfg, str(gen_dir), str(stats), str(log), batch_size=6, with_prdc=True
    )
    assert np.isfinite(fid)
    text = log.read_text()
    assert "PRDC[RANDOM-INIT" in text and "(k=5)" in text
    for name in ("precision=", "recall=", "density=", "coverage="):
        assert name in text

    bare = tmp_path / "bare.npz"
    precalculate(cfg, str(real_dir), str(bare), batch_size=6)
    with pytest.raises(ValueError, match="save_features"):
        evaluate_generated(
            cfg, str(gen_dir), str(bare), str(log), batch_size=6, with_prdc=True
        )


def test_precalculate_from_zip_matches_directory(tmp_path, tiny_cfg):
    """pre-calculate accepts a .zip archive of images (same ingestion
    contract as training's data/celeba.py) and produces identical stats to
    the extracted directory."""
    import zipfile

    from PIL import Image

    from littlegan_tpu.eval.evaluate import precalculate

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(4)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            d / f"{i}.jpg", quality=95
        )
    zpath = tmp_path / "imgs.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(6):
            z.write(d / f"{i}.jpg", f"imgs/{i}.jpg")
    cfg = tiny_cfg.replace(allow_random_fid=True)
    precalculate(cfg, str(d), str(tmp_path / "dir.npz"), batch_size=4)
    precalculate(cfg, str(zpath), str(tmp_path / "zip.npz"), batch_size=4)
    a, b = np.load(tmp_path / "dir.npz"), np.load(tmp_path / "zip.npz")
    np.testing.assert_array_equal(a["mu"], b["mu"])
    np.testing.assert_array_equal(a["sigma"], b["sigma"])


# ---------------------------- real-weights on-ramp (round-4 verdict #6) ----
# The container has no egress and no weight file; these tests validate every
# edge of the on-ramp that CAN be validated in-tree: the keras .h5 /
# SavedModel conversion paths (synthetic weights in keras's exact layout),
# the build-order mapping against a LIVE keras InceptionV3, the cache
# probe, and a committed torch-generated golden-feature fixture that lets a
# future conversion validate in seconds.

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "inception_synthetic_goldens.npz")


def test_golden_fixture_validates_conversion():
    """Converter + JAX extractor must reproduce the committed torch-generated
    features (tests/golden/, generated by torch_inception_ref on
    synthetic_state_dict(seed=6)) — the fast forward-path validator."""
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features

    conv = _converter()
    params = conv.convert(conv.synthetic_state_dict(seed=6))
    with np.load(_GOLDEN) as z:
        imgs, want = z["images"].astype(np.float32), z["features"]
    got = np.asarray(inception_features(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def _write_keras_h5(path, sd, with_gamma=True, base=1):
    """Synthetic torchvision state_dict -> keras-layout .h5 (the downloaded
    inception_v3_weights_* structure: 1-based conv2d_N layer groups, HWIO
    kernels, optional gamma for scale=False parity)."""
    import h5py

    conv = _converter()
    order = conv.keras_order()
    with h5py.File(path, "w") as f:
        for i, ours in enumerate(order):
            tv = conv._NAME_MAP[ours]
            idx = i + base
            suffix = f"_{idx}" if idx else ""
            cname, bname = f"conv2d{suffix}", f"batch_normalization{suffix}"
            w = np.transpose(sd[f"{tv}.conv.weight"], (2, 3, 1, 0))
            f.create_dataset(f"{cname}/{cname}/kernel:0", data=w)
            if with_gamma:
                f.create_dataset(f"{bname}/{bname}/gamma:0", data=sd[f"{tv}.bn.weight"])
            f.create_dataset(f"{bname}/{bname}/beta:0", data=sd[f"{tv}.bn.bias"])
            f.create_dataset(f"{bname}/{bname}/moving_mean:0", data=sd[f"{tv}.bn.running_mean"])
            f.create_dataset(f"{bname}/{bname}/moving_variance:0", data=sd[f"{tv}.bn.running_var"])
        f.create_dataset("predictions/predictions/kernel:0", data=np.transpose(sd["fc.weight"], (1, 0)))
        f.create_dataset("predictions/predictions/bias:0", data=sd["fc.bias"])


def test_keras_h5_matches_torchvision_conversion(tmp_path):
    """Same underlying weights through the keras .h5 path and the
    torchvision path must produce identical npz mappings (order mapping +
    BN folding + fc transpose all agree)."""
    conv = _converter()
    sd = conv.synthetic_state_dict(seed=8)
    want = conv.convert(sd)
    h5 = tmp_path / "keras_inception.h5"
    _write_keras_h5(h5, sd)
    got = conv.load_keras_h5(str(h5))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-6, err_msg=k)


def test_keras_h5_zero_based_and_scale_false(tmp_path):
    """Modern keras naming (conv2d, conv2d_1, ...) and scale=False BNs
    (no gamma dataset -> gamma folded as 1)."""
    conv = _converter()
    sd = conv.synthetic_state_dict(seed=9)
    h5 = tmp_path / "keras_modern.h5"
    _write_keras_h5(h5, sd, with_gamma=False, base=0)
    got = conv.load_keras_h5(str(h5))
    sd1 = dict(sd)
    for k in list(sd1):
        if k.endswith(".bn.weight"):
            sd1[k] = np.ones_like(sd1[k])
    want = conv.convert(sd1)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_keras_order_matches_live_model():
    """keras_order() is validated against an actual
    tf.keras.applications.InceptionV3: same conv count, kernel-shape
    sequence in build order, and scale=False BNs."""
    tf = pytest.importorskip("tensorflow")

    from littlegan_tpu.eval.inception import _conv_specs

    conv = _converter()
    spec = {n: (kh, kw, cin, cout) for n, kh, kw, cin, cout in _conv_specs()}
    want_shapes = [
        (spec[n][0], spec[n][1], spec[n][2], spec[n][3]) for n in conv.keras_order()
    ]
    model = tf.keras.applications.InceptionV3(weights=None)
    # model.layers is TOPOLOGICALLY sorted; the conv2d_N NAMES carry the
    # creation order keras_order() maps against — sort by name index
    by_idx, bn_scales = {}, []
    for layer in model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D" and layer.name.startswith("conv2d"):
            rest = layer.name[len("conv2d"):]
            by_idx[int(rest[1:]) if rest else 0] = tuple(layer.get_weights()[0].shape)
        elif cls == "BatchNormalization":
            bn_scales.append(layer.scale)
    got_shapes = [by_idx[i] for i in sorted(by_idx)]
    assert len(got_shapes) == 94
    assert got_shapes == want_shapes
    assert not any(bn_scales)  # keras.applications builds scale=False


@pytest.mark.slow
def test_keras_model_file_conversion(tmp_path):
    """A saved keras InceptionV3 model file converts through
    load_keras_savedmodel with the extractor's exact keyset/shapes."""
    tf = pytest.importorskip("tensorflow")

    from littlegan_tpu.eval.inception import init_inception_params

    conv = _converter()
    model = tf.keras.applications.InceptionV3(weights=None)
    path = tmp_path / "inception.keras"
    model.save(str(path))
    got = conv.load_keras_savedmodel(str(path))
    ref = init_inception_params("", seed=0)
    assert set(got) == set(ref)
    for k in got:
        assert got[k].shape == ref[k].shape, k


def test_probe_reports_cached_weights(tmp_path, monkeypatch, capsys):
    """The cache probe finds inception-named files in the standard cache
    locations and says what it found (or that nothing exists)."""
    conv = _converter()
    fake_home = tmp_path / "home"
    keras_dir = fake_home / ".keras" / "models"
    keras_dir.mkdir(parents=True)
    (keras_dir / "inception_v3_weights_tf_dim_ordering_tf_kernels.h5").write_bytes(b"x")
    (keras_dir / "vgg16_weights.h5").write_bytes(b"x")
    monkeypatch.setattr(
        conv.os.path, "expanduser", lambda p: p.replace("~", str(fake_home))
    )
    hits = conv.probe_weight_caches()
    out = capsys.readouterr().out
    assert len(hits) == 1 and "inception_v3_weights" in hits[0]
    assert "convert_inception.py" in out  # prints the next command to run

    monkeypatch.setattr(conv.os.path, "expanduser", lambda p: p.replace("~", str(tmp_path / "empty")))
    assert conv.probe_weight_caches() == []
    assert "no cached model weights" in capsys.readouterr().out


# ----------------- pytorch-FID FIDInception variant (round-5 verdict #1) ----
# pt_inception-2015-12-05-*.pth — the weights behind virtually all published
# FID numbers — is a DIFFERENT network from torchvision's InceptionV3
# (FIDInceptionA/C/E_1 avg-pools count_include_pad=False, E_2 max-pools its
# branch). These tests pin the variant's converter detection, the extractor's
# pooling switch, full-network torch parity, and a committed golden fixture.

_GOLDEN_FID2015 = os.path.join(
    os.path.dirname(__file__), "golden", "inception_synthetic_goldens_fid2015.npz"
)


@pytest.mark.core
def test_converter_detects_pt_inception_variant():
    """A 1008-class fc (the 2015 graph layout pytorch-FID ships) flips the
    conversion to the FIDInception variant: marker key present, fc kept at
    1008 columns; the torchvision layout stays unmarked."""
    from littlegan_tpu.eval.inception import FID2015_MARKER, inception_variant

    conv = _converter()
    pt = conv.convert(conv.synthetic_state_dict(seed=11, variant="fid2015"))
    assert FID2015_MARKER in pt and inception_variant(pt) == "fid2015"
    assert pt["fc/w"].shape == (2048, 1008)

    tv = conv.convert(conv.synthetic_state_dict(seed=11))
    assert FID2015_MARKER not in tv and inception_variant(tv) == "tv"
    assert tv["fc/w"].shape == (2048, 1000)

    # explicit override for fc-less partial dumps
    sd = conv.synthetic_state_dict(seed=11, variant="fid2015")
    forced = conv.convert(sd, variant="fid2015")
    assert FID2015_MARKER in forced
    with pytest.raises(SystemExit):
        conv.convert(sd, variant="nonsense")


@pytest.fixture(scope="module")
def fid2015_pair():
    """(state_dict, converted params, 299 input, jax features) for the
    FIDInception variant."""
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features

    conv = _converter()
    sd = conv.synthetic_state_dict(seed=12, variant="fid2015")
    params = conv.convert(sd)
    img299 = np.random.default_rng(13).integers(0, 256, (1, 299, 299, 3)).astype(np.float32)
    f299 = np.asarray(inception_features(params, jnp.asarray(img299)))
    return sd, params, img299, f299


@pytest.mark.slow
def test_fid2015_full_network_matches_torch_299(fid2015_pair):
    """JAX FIDInception graph == torch transcription with the exact
    pytorch-FID block patches (count_include_pad=False A/C/E_1 pools, E_2
    max-pool), native 299 input."""
    from tests.torch_inception_ref import Mutation, torch_inception_features

    sd, _, img299, f299 = fid2015_pair
    want = torch_inception_features(sd, img299, Mutation(fid_pool=True)).numpy()
    np.testing.assert_allclose(f299, want, rtol=_PARITY_RTOL, atol=_PARITY_ATOL)


@pytest.mark.slow
def test_fid2015_full_network_matches_torch_128_resize(fid2015_pair):
    """Same through the bilinear 128->299 preprocessing path (the geometry
    FID evals of this model family exercise)."""
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features
    from tests.torch_inception_ref import Mutation, torch_inception_features

    sd, params = fid2015_pair[0], fid2015_pair[1]
    img128 = np.random.default_rng(14).integers(0, 256, (1, 128, 128, 3)).astype(np.float32)
    got = np.asarray(inception_features(params, jnp.asarray(img128)))
    want = torch_inception_features(sd, img128, Mutation(fid_pool=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=_PARITY_RTOL, atol=_PARITY_ATOL)


@pytest.mark.slow
def test_fid2015_pooling_differs_from_tv(fid2015_pair):
    """Sensitivity proof: the SAME weights through torchvision pooling land
    outside the parity tolerance — i.e. loading pt_inception weights onto
    the torchvision graph (what the pre-round-5 converter would have done)
    is a detectably wrong network, and the marker actually switches it."""
    from littlegan_tpu.eval.inception import FID2015_MARKER, inception_features

    import jax.numpy as jnp

    sd, params, img299, f299 = fid2015_pair
    tv_params = {k: v for k, v in params.items() if k != FID2015_MARKER}
    f_tv = np.asarray(inception_features(tv_params, jnp.asarray(img299)))
    assert np.abs(f_tv - f299).max() > 10 * _PARITY_ATOL


@pytest.mark.slow
def test_fid2015_torch_ref_mutation_sensitivity(fid2015_pair):
    """The torch reference itself distinguishes the variants: fid_pool flips
    features beyond tolerance, so the parity tests above can't silently pass
    with the wrong reference."""
    from tests.torch_inception_ref import Mutation, torch_inception_features

    sd, _, img299, _ = fid2015_pair
    a = torch_inception_features(sd, img299, Mutation(fid_pool=True)).numpy()
    b = torch_inception_features(sd, img299).numpy()
    assert np.abs(a - b).max() > 10 * _PARITY_ATOL


def test_fid2015_golden_fixture_validates_conversion():
    """Converter + extractor reproduce the committed torch-generated
    FIDInception features (generated by torch_inception_ref with
    fid_pool=True on synthetic_state_dict(seed=12, variant='fid2015')) —
    the seconds-fast validator a future real pt_inception conversion runs
    against."""
    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import inception_features

    conv = _converter()
    params = conv.convert(conv.synthetic_state_dict(seed=12, variant="fid2015"))
    with np.load(_GOLDEN_FID2015) as z:
        imgs, want = z["images"].astype(np.float32), z["features"]
    got = np.asarray(inception_features(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_pt_inception_cli_end_to_end(tmp_path):
    """pt_inception-layout .npz through the converter CLI: auto-detects the
    variant (says so), output npz drives the extractor with the marker
    riding along, and Inception Score works over the 1008-class head."""
    import subprocess
    import sys as _sys

    import jax.numpy as jnp

    from littlegan_tpu.eval.inception import (
        FID2015_MARKER,
        class_probs_from_features,
        inception_features,
        init_inception_params,
    )

    conv = _converter()
    src = tmp_path / "pt_inception_state.npz"
    dst = tmp_path / "fid_weights.npz"
    np.savez_compressed(src, **conv.synthetic_state_dict(seed=15, variant="fid2015"))
    proc = subprocess.run(
        [_sys.executable, "scripts/convert_inception.py", str(src), str(dst)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr
    assert "FIDInception" in proc.stdout
    assert "94 conv-bn blocks" in proc.stdout

    loaded = init_inception_params(str(dst))
    assert FID2015_MARKER in loaded
    imgs = jnp.asarray(
        np.random.default_rng(16).integers(0, 255, (2, 64, 64, 3)), jnp.float32
    )
    feats = np.asarray(inception_features(loaded, imgs))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
    probs = class_probs_from_features(loaded, feats)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-9)


def test_probe_flags_pt_inception(tmp_path, monkeypatch, capsys):
    """The cache probe names the pt_inception file as the published-FID
    standard and recommends converting IT over other inception candidates."""
    conv = _converter()
    fake_home = tmp_path / "home"
    hub = fake_home / ".cache" / "torch" / "hub" / "checkpoints"
    hub.mkdir(parents=True)
    (hub / "inception_v3_google-0cc3c7bd.pth").write_bytes(b"x")
    (hub / "pt_inception-2015-12-05-6726825d.pth").write_bytes(b"x")
    monkeypatch.setattr(
        conv.os.path, "expanduser", lambda p: p.replace("~", str(fake_home))
    )
    hits = conv.probe_weight_caches()
    out = capsys.readouterr().out
    assert len(hits) == 2
    assert "pytorch-FID FIDInception" in out
    assert "convert_inception.py" in out
    next_line = [l for l in out.splitlines() if l.startswith("next:")][0]
    assert "pt_inception" in next_line


@pytest.mark.core
def test_metric_labels_name_the_standard(tmp_path, tiny_cfg):
    """With weights loaded, FID/IS labels name WHICH published standard the
    file pins (pytorch-FID vs torchvision) — one ambiguous 'FID' label
    stopped being enough the moment both variants were supported."""
    from littlegan_tpu.eval.evaluate import fid_label, is_label

    conv = _converter()
    tv = tmp_path / "tv.npz"
    pt = tmp_path / "pt.npz"
    np.savez_compressed(tv, **conv.convert(conv.synthetic_state_dict(seed=20)))
    np.savez_compressed(
        pt, **conv.convert(conv.synthetic_state_dict(seed=20, variant="fid2015"))
    )
    assert fid_label(tiny_cfg.replace(fid_weights="")) == (
        "FID[RANDOM-INIT Inception, NOT comparable]"
    )
    assert fid_label(tiny_cfg.replace(fid_weights=str(tv))) == "FID[torchvision standard]"
    assert fid_label(tiny_cfg.replace(fid_weights=str(pt))) == "FID[pytorch-FID standard]"
    assert is_label(tiny_cfg.replace(fid_weights=str(pt))) == "IS[pytorch-FID standard]"
