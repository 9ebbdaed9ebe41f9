"""FID stack tests: Fréchet-distance golden values vs closed forms, scipy
agreement, Newton–Schulz device path, inception extractor shapes, and the
two-mode eval driver on synthetic images (SURVEY §4)."""

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
    cfg = tiny_cfg
    stats = tmp_path / "stats.npz"
    log = tmp_path / "fid.log"
    precalculate(cfg, str(real_dir), str(stats), batch_size=8)
    assert stats.exists()
    fid = evaluate_generated(cfg, str(gen_dir), str(stats), str(log), batch_size=8)
    assert np.isfinite(fid)
    assert "FID" in log.read_text()
