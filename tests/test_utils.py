"""Utility tests vs reference utils.py math."""

import numpy as np
import pytest

pytestmark = pytest.mark.core  # sub-5-min gate tier (round-4 verdict #4)

from littlegan_tpu.utils.image import data_rescale, inverse_rescale, soft, to_grid


def test_soft():
    # reference utils.py:47-48 — on +-1 labels gives {-0.94, 0.98}
    assert soft(1.0) == 0.98
    assert abs(soft(-1.0) - (-0.94)) < 1e-12
    assert soft(0.0) == 0.02


def test_rescale_roundtrip():
    x = np.arange(256, dtype=np.float32)
    y = data_rescale(x)
    assert y.min() == -1.0 and abs(y.max() - 1.0) < 1e-6
    back = inverse_rescale(y)
    np.testing.assert_array_equal(back, x)


def test_inverse_rescale_rounds():
    # reference utils.py:55-56 rounds before uint8 cast
    assert inverse_rescale(np.array([0.0]))[0] == 128.0  # round(127.5) banker's-> 128? np.round(127.5)=128
    assert inverse_rescale(np.array([-1.0]))[0] == 0.0
    assert inverse_rescale(np.array([1.0]))[0] == 255.0


def test_grid_near_square():
    batch = np.arange(5 * 2 * 3 * 1, dtype=np.uint8).reshape(5, 2, 3, 1)
    grid = to_grid(batch)
    # n=5 -> cols=ceil(sqrt(5))=3, rows=ceil(5/3)=2 (reference utils.py:16-22)
    assert grid.shape == (2 * 2, 3 * 3, 1)
    # reference layout: index fills columns downward (utils.py:27-30)
    np.testing.assert_array_equal(grid[0:2, 0:3], batch[0])
    np.testing.assert_array_equal(grid[2:4, 0:3], batch[1])
    np.testing.assert_array_equal(grid[0:2, 3:6], batch[2])


def test_grid_explicit_shape():
    batch = np.zeros((8, 4, 4, 3), dtype=np.uint8)
    grid = to_grid(batch, (1, 8))
    assert grid.shape == (4, 32, 3)


def test_save_image_file(tmp_path):
    from littlegan_tpu.utils.image import save_image

    img = np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    p = tmp_path / "g.jpg"
    save_image(img, str(p))
    assert p.exists() and p.stat().st_size > 0


def test_tpu_compiler_options_gating(monkeypatch):
    """TPU-only compile options must stay off CPU compiles (option names
    would be rejected), honor Config.scoped_vmem_kib, and disable on 0."""
    import jax

    from littlegan_tpu.config import Config
    from littlegan_tpu.utils.jax_cache import tpu_compiler_options

    assert tpu_compiler_options() is None  # conftest forces the CPU backend

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert tpu_compiler_options() == {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    assert tpu_compiler_options(Config(scoped_vmem_kib=8192, debug=True)) == {
        "xla_tpu_scoped_vmem_limit_kib": "8192"
    }
    assert tpu_compiler_options(Config(scoped_vmem_kib=0, debug=True)) is None

    # free-form passthrough (Config.xla_options): merged over the VMEM
    # option, user keys win on collision, values stringified
    assert tpu_compiler_options(
        Config(xla_options={"xla_tpu_nested_dot_fusion": "true"}, debug=True)
    ) == {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_nested_dot_fusion": "true",
    }
    assert tpu_compiler_options(
        Config(xla_options={"xla_tpu_scoped_vmem_limit_kib": 1024}, debug=True)
    ) == {"xla_tpu_scoped_vmem_limit_kib": "1024"}
    assert tpu_compiler_options(
        Config(scoped_vmem_kib=0, xla_options={"a": "b"}, debug=True)
    ) == {"a": "b"}


def test_slerp_goldens():
    """utils/latent.py slerp: exact endpoints, great-circle norm for unit
    inputs, lerp fallback for (anti)parallel pairs, midpoint symmetry."""
    from littlegan_tpu.utils.latent import slerp

    rng = np.random.default_rng(0)
    z0 = rng.normal(size=(5, 16)).astype(np.float32)
    z1 = rng.normal(size=(5, 16)).astype(np.float32)
    t = np.linspace(0.0, 1.0, 7, dtype=np.float32)
    out = slerp(z0, z1, t)
    assert out.shape == (7, 5, 16)
    np.testing.assert_allclose(out[0], z0, rtol=1e-5, atol=1e-6)  # t=0 endpoint
    np.testing.assert_allclose(out[-1], z1, rtol=1e-5, atol=1e-6)  # t=1 endpoint

    # unit vectors stay on the sphere at every step (the reason to slerp)
    u0 = z0 / np.linalg.norm(z0, axis=-1, keepdims=True)
    u1 = z1 / np.linalg.norm(z1, axis=-1, keepdims=True)
    norms = np.linalg.norm(slerp(u0, u1, t), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # ...unlike lerp, whose midpoint falls inside the shell
    lerp_mid = np.linalg.norm(0.5 * u0 + 0.5 * u1, axis=-1)
    assert (lerp_mid < 0.95).all()

    # parallel pair: sin(omega)=0 -> lerp fallback, constant trajectory
    same = slerp(z0, z0.copy(), t)
    for k in range(7):
        np.testing.assert_allclose(same[k], z0, rtol=1e-5, atol=1e-6)

    # midpoint is the angle bisector: equal cosine to both unit endpoints
    mid = slerp(u0, u1, np.array([0.5], np.float32))[0]
    mid = mid / np.linalg.norm(mid, axis=-1, keepdims=True)
    c0 = (mid * u0).sum(-1)
    c1 = (mid * u1).sum(-1)
    np.testing.assert_allclose(c0, c1, rtol=1e-4)


def test_batch_image_writer(tmp_path):
    """Pooled writes are byte-identical to serial save_image; worker errors
    re-raise on close instead of vanishing in the pool."""
    from littlegan_tpu.utils.image import BatchImageWriter, save_image

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, size=(12, 8, 8, 3)).astype(np.float32)
    with BatchImageWriter(workers=3, max_pending=4) as w:
        for i in range(12):
            w.save(imgs[i], str(tmp_path / f"pooled{i}.jpg"))
    for i in range(12):
        serial = tmp_path / f"serial{i}.jpg"
        save_image(imgs[i], str(serial))
        assert serial.read_bytes() == (tmp_path / f"pooled{i}.jpg").read_bytes()

    w2 = BatchImageWriter(workers=2)
    w2.save(imgs[0], str(tmp_path / "no_such_dir" / "x.jpg"))
    with pytest.raises(FileNotFoundError):
        w2.close()
