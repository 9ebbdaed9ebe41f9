"""Data pipeline tests on a synthetic CelebA tree (SURVEY §4: pipeline tests
on synthetic JPEGs)."""

import os

import numpy as np
import pytest

from littlegan_tpu.data.celeba import CelebA, parse_attr_file
from littlegan_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def celeba_tree(tmp_path_factory):
    """24 random 16x16 JPEGs + a standard-format attr file."""
    from PIL import Image

    root = tmp_path_factory.mktemp("celeba")
    img_dir = root / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(24):
        name = f"{i:06d}.jpg"
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name, quality=95)
        names.append(name)
    attrs = rng.choice([-1, 1], size=(24, 40))
    lines = ["24", " ".join(f"A{i}" for i in range(40))]
    for name, row in zip(names, attrs):
        lines.append(name + " " + " ".join(str(v) for v in row))
    attr_file = root / "attrs.txt"
    attr_file.write_text("\n".join(lines))
    return str(img_dir), str(attr_file), attrs


def _cfg(tiny_cfg, img_dir, attr_file, **kw):
    return tiny_cfg.replace(
        image_path=img_dir, attr_path=attr_file, image_dim=16, batch_size=4, **kw
    )


def test_attr_parse_standard_header(celeba_tree):
    _, attr_file, attrs = celeba_tree
    by_name, by_line = parse_attr_file(attr_file, [0, 2, 4])
    assert len(by_name) == 24 and len(by_line) == 24
    np.testing.assert_array_equal(by_name["000000.jpg"], attrs[0][[0, 2, 4]])


def test_attr_parse_headerless(tmp_path):
    p = tmp_path / "raw.txt"
    p.write_text("a.jpg 1 -1\nb.jpg -1 1\n")
    by_name, by_line = parse_attr_file(str(p), None)
    assert by_line == [[1.0, -1.0], [-1.0, 1.0]]


@pytest.mark.parametrize("native", [False, True])
def test_pipeline_batches(tiny_cfg, celeba_tree, native):
    img_dir, attr_file, attrs = celeba_tree
    cfg = _cfg(tiny_cfg, img_dir, attr_file, use_native_loader=native)
    ds = CelebA(cfg)
    assert ds.batches == 6
    assert len(ds.label) == cfg.cond_dim
    batches = list(ds.epoch_iterator(0))
    assert len(batches) == 6
    img, cond = batches[0]
    # default contract: uint8 ships to the device; the jitted step rescales
    assert img.shape == (4, 16, 16, 3) and img.dtype == np.uint8
    assert cond.shape == (4, cfg.cond_dim)
    # labels are softened ±1 (reference dataset.py:33)
    uniq = np.unique(cond)
    assert all(np.isclose(u, -0.94) or np.isclose(u, 0.98) for u in uniq)


def test_pipeline_host_rescale_mode(tiny_cfg, celeba_tree):
    """host_rescale=True restores the reference's f32 [-1,1] contract
    (dataset.py:31-32) and matches the device-side rescale exactly."""
    img_dir, attr_file, _ = celeba_tree
    u8 = next(CelebA(_cfg(tiny_cfg, img_dir, attr_file)).epoch_iterator(0))[0]
    f32 = next(CelebA(_cfg(tiny_cfg, img_dir, attr_file, host_rescale=True)).epoch_iterator(0))[0]
    assert f32.dtype == np.float32 and f32.min() >= -1.0 and f32.max() <= 1.0
    np.testing.assert_allclose(u8.astype(np.float32) / 127.5 - 1.0, f32, atol=1e-6)

    import jax.numpy as jnp

    from littlegan_tpu.training.step import _prep_images

    np.testing.assert_allclose(np.asarray(_prep_images(jnp.asarray(u8))), f32, atol=1e-6)
    np.testing.assert_allclose(np.asarray(_prep_images(jnp.asarray(f32))), f32, atol=1e-6)


def test_native_matches_pil_decode(tiny_cfg, celeba_tree):
    """The C++ decoder must agree with PIL on identical JPEGs (same size, no
    resize path)."""
    img_dir, attr_file, _ = celeba_tree
    a = CelebA(_cfg(tiny_cfg, img_dir, attr_file, use_native_loader=True))
    b = CelebA(_cfg(tiny_cfg, img_dir, attr_file, use_native_loader=False))
    (img_a, _), (img_b, _) = next(a.epoch_iterator(3)), next(b.epoch_iterator(3))
    np.testing.assert_array_equal(img_a, img_b)


def test_epoch_shuffle_is_seeded(tiny_cfg, celeba_tree):
    img_dir, attr_file, _ = celeba_tree
    ds = CelebA(_cfg(tiny_cfg, img_dir, attr_file))
    e0 = [c.sum() for _, c in ds.epoch_iterator(0)]
    e0b = [c.sum() for _, c in ds.epoch_iterator(0)]
    e1 = [c.sum() for _, c in ds.epoch_iterator(1)]
    assert e0 == e0b  # deterministic per (seed, epoch)
    assert sorted(e0) == sorted(e1)  # same batches...
    assert e0 != e1  # ...different order (batch-level shuffle)


def test_epoch_iterator_start_batch_is_exact_tail(tiny_cfg, celeba_tree):
    """start_batch (mid-epoch resume) yields the bitwise tail of the full
    epoch stream — CelebA skips the decode entirely, the synthetic dataset
    draws-and-discards to keep its sequential RNG stream aligned."""
    img_dir, attr_file, _ = celeba_tree
    ds = CelebA(_cfg(tiny_cfg, img_dir, attr_file))
    full = list(ds.epoch_iterator(2))
    tail = list(ds.epoch_iterator(2, start_batch=2))
    assert len(tail) == len(full) - 2
    for (fi, fc), (ti, tc) in zip(full[2:], tail):
        np.testing.assert_array_equal(fi, ti)
        np.testing.assert_array_equal(fc, tc)
    assert list(ds.epoch_iterator(2, start_batch=len(full))) == []

    syn = SyntheticDataset(tiny_cfg, num_items=6 * tiny_cfg.batch_size)
    full_s = list(syn.epoch_iterator(1))
    tail_s = list(syn.epoch_iterator(1, start_batch=4))
    assert len(tail_s) == 2
    for (fi, fc), (ti, tc) in zip(full_s[4:], tail_s):
        np.testing.assert_array_equal(fi, ti)
        np.testing.assert_array_equal(fc, tc)


def test_host_sharding(tiny_cfg, celeba_tree):
    img_dir, attr_file, _ = celeba_tree
    full = CelebA(_cfg(tiny_cfg, img_dir, attr_file))
    s0 = CelebA(_cfg(tiny_cfg, img_dir, attr_file), shard_index=0, shard_count=2)
    s1 = CelebA(_cfg(tiny_cfg, img_dir, attr_file), shard_index=1, shard_count=2)
    assert s0.num_items + s1.num_items == full.num_items
    assert not set(s0._files) & set(s1._files)


def test_synthetic_contract(tiny_cfg):
    ds = SyntheticDataset(tiny_cfg, num_items=16)
    img, cond = next(ds.epoch_iterator(0))
    assert img.shape == (4, 16, 16, 3)
    img2, _ = next(ds.epoch_iterator(0))
    np.testing.assert_array_equal(img, img2)  # deterministic


def test_native_loader_rejects_garbage(tmp_path, tiny_cfg):
    pytest.importorskip("ctypes")
    from littlegan_tpu.data.native_loader import NativeBatchLoader

    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    loader = NativeBatchLoader(16, 3, threads=2)
    with pytest.raises(IOError):
        loader.load([str(bad)])


def test_decoded_cache(tiny_cfg, celeba_tree):
    img_dir, attr_file, _ = celeba_tree
    cfg = _cfg(tiny_cfg, img_dir, attr_file, cache_decoded=True)
    ds = CelebA(cfg)
    e0 = list(ds.epoch_iterator(0))
    assert len(ds._cache) == ds.num_items  # fully cached after one epoch
    e0b = list(ds.epoch_iterator(0))  # served from cache
    for (a, _), (b, _) in zip(e0, e0b):
        np.testing.assert_array_equal(a, b)


def test_native_resize_matches_pil_bytewise(tmp_path, tiny_cfg):
    """Native crop+resize is a BYTE-EXACT port of Pillow's 8-bit BILINEAR
    resampler (fixed-point coefficients, uint8 intermediate, clip8 rounding)
    — checked on down- and up-scales of a non-square image."""
    from PIL import Image

    from littlegan_tpu.data.native_loader import NativeBatchLoader

    rng = np.random.default_rng(7)
    big = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)  # non-square
    p = tmp_path / "big.jpg"
    Image.fromarray(big).save(p, quality=100, subsampling=0)

    for dim in (16, 37, 96):  # downscale, odd, upscale
        native = NativeBatchLoader(dim, 3, threads=1).load([str(p)])[0]
        img = Image.open(p).convert("RGB")
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
        pil = np.asarray(img.resize((dim, dim), Image.BILINEAR), np.uint8)
        np.testing.assert_array_equal(native, pil, err_msg=str(dim))


def test_celeba_aligned_178x218_both_paths_bytewise(tmp_path_factory, tiny_cfg):
    """The official aligned CelebA archive geometry (178x218 JPEGs) flows
    through the FULL pipeline with zero preprocessing: center-crop to 178^2 +
    bilinear resize to image_dim, with the native and PIL decode paths
    byte-identical (round-1 verdict #8)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("celeba178")
    img_dir = root / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(11)
    names = []
    for i in range(8):
        name = f"{i:06d}.jpg"
        arr = rng.integers(0, 255, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name, quality=95)
        names.append(name)
    attrs = rng.choice([-1, 1], size=(8, 40))
    lines = ["8", " ".join(f"A{i}" for i in range(40))]
    for name, row in zip(names, attrs):
        lines.append(name + " " + " ".join(str(v) for v in row))
    attr_file = root / "attrs.txt"
    attr_file.write_text("\n".join(lines))

    cfg_n = tiny_cfg.replace(
        image_path=str(img_dir), attr_path=str(attr_file), image_dim=32,
        batch_size=4, use_native_loader=True,
    )
    a = CelebA(cfg_n)
    b = CelebA(cfg_n.replace(use_native_loader=False))
    assert a.batches == b.batches == 2
    for (ia, ca), (ib, cb) in zip(a.epoch_iterator(0), b.epoch_iterator(0)):
        assert ia.shape == (4, 32, 32, 3) and ia.dtype == np.uint8
        np.testing.assert_array_equal(ia, ib)  # byte-wise agreement
        np.testing.assert_array_equal(ca, cb)


def test_native_loader_autobuilds(tmp_path):
    """Fresh-clone path: the .so is not tracked in git; first use must build it."""
    import shutil

    from littlegan_tpu.data import native_loader

    so = native_loader._LIB_PATH
    backup = None
    if os.path.isfile(so):
        backup = str(tmp_path / "libloader.so.bak")
        shutil.move(so, backup)
    try:
        path = native_loader._ensure_built()
        assert os.path.isfile(path)
    finally:
        if backup and not os.path.isfile(so):
            shutil.move(backup, so)


def test_headerless_count_mismatch_refused(tiny_cfg, tmp_path):
    """Line-order pairing with a count mismatch would silently shift/truncate
    labels (training on mislabeled data with no crash) — must refuse."""
    from PIL import Image

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            img_dir / f"{i:06d}.jpg"
        )
    # headerless attr file with only 4 label lines for 5 images
    attr_file = tmp_path / "attrs.txt"
    attr_file.write_text("\n".join(" ".join("1" for _ in range(40)) for _ in range(4)))
    with pytest.raises(ValueError, match="counts must match"):
        CelebA(_cfg(tiny_cfg, str(img_dir), str(attr_file)))


def test_cross_mode_batch_order_identical(tiny_cfg, celeba_tree):
    """Same seed -> bitwise-identical batch sequence across pipeline modes
    (round-2 verdict weak #6): the device store uploads in canonical order
    (shuffle=False) and the trainer's _device_epoch permutes with the SAME
    epoch_batch_order stream that epoch_iterator uses, so host-fed,
    device_data, and scan dispatch all see the same batches in the same
    order."""
    from littlegan_tpu.data.celeba import epoch_batch_order

    img_dir, attr_file, _ = celeba_tree
    ds = CelebA(_cfg(tiny_cfg, img_dir, attr_file))
    store = [img for img, _ in ds.epoch_iterator(0, shuffle=False)]  # canonical
    # canonical order really is file-sorted (store row j == batch j)
    again = [img for img, _ in ds.epoch_iterator(3, shuffle=False)]
    for a, b in zip(store, again):
        np.testing.assert_array_equal(a, b)
    for epoch in (0, 1, 5):
        order = epoch_batch_order(ds.cfg.seed, epoch, ds.batches)
        host = [img for img, _ in ds.epoch_iterator(epoch)]
        assert len(host) == len(order)
        for k, b in enumerate(order):
            np.testing.assert_array_equal(host[k], store[int(b)])


def test_set_rows_per_batch_covers_shard(tiny_cfg, celeba_tree):
    """Multi-host decode slicing primitive (round-2 verdict #5b): with
    rows_per_batch set, batches shrink to the per-host row count, the batch
    count is recomputed from the GLOBAL item count, and one epoch decodes
    each local row exactly once."""
    img_dir, attr_file, _ = celeba_tree
    ds = CelebA(_cfg(tiny_cfg, img_dir, attr_file))  # 24 items, batch 4
    assert ds.rows_per_batch == 4 and ds.batches == 6
    ds.set_rows_per_batch(2)
    assert ds.batches == 12  # (24 global / 1 shard) / 2 rows
    before = ds.decoded_rows
    batches = list(ds.epoch_iterator(0, shuffle=False))
    assert len(batches) == 12
    assert all(img.shape[0] == 2 for img, _ in batches)
    assert ds.decoded_rows - before == 24  # full shard, no waste


def test_synthetic_rows_per_batch_and_shards(tiny_cfg):
    """SyntheticDataset honors the multi-host local-rows contract: rows per
    batch shrink, per-shard substreams decorrelate, and shard 0 keeps the
    historical stream (golden trajectories depend on it)."""
    ds0 = SyntheticDataset(tiny_cfg, num_items=16)
    legacy = [img for img, _ in ds0.epoch_iterator(0)]
    ds0b = SyntheticDataset(tiny_cfg, num_items=16, shard_index=0)
    for a, (b, _) in zip(legacy, ds0b.epoch_iterator(0)):
        np.testing.assert_array_equal(a, b)
    ds1 = SyntheticDataset(tiny_cfg, num_items=16, shard_index=1)
    b1 = next(ds1.epoch_iterator(0))[0]
    assert not np.array_equal(legacy[0], b1)  # decorrelated substream
    ds1.set_rows_per_batch(2)
    img, cond = next(ds1.epoch_iterator(0))
    assert img.shape[0] == 2 and cond.shape[0] == 2
    assert ds1.batches == ds0.batches  # dispatch counts agree across hosts


@pytest.fixture(scope="module")
def celeba_zip(celeba_tree, tmp_path_factory):
    """The celeba_tree images packed as the official archive layout:
    a deflate-compressed zip with members under a directory prefix
    (img_align_celeba/NNNNNN.jpg)."""
    import zipfile

    img_dir, attr_file, attrs = celeba_tree
    zpath = tmp_path_factory.mktemp("zip") / "img_align_celeba.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for name in sorted(os.listdir(img_dir)):
            z.write(os.path.join(img_dir, name), f"img_align_celeba/{name}")
    return str(zpath), attr_file


@pytest.mark.parametrize("native", [False, True])
def test_zip_archive_matches_directory(tiny_cfg, celeba_tree, celeba_zip, native):
    """image_path pointed at a .zip yields byte-identical batches to the
    extracted directory, on both the native (load_buffers) and PIL decode
    paths — no extraction step needed for the official archive."""
    img_dir, attr_file, _ = celeba_tree
    zpath, _ = celeba_zip
    ds_dir = CelebA(_cfg(tiny_cfg, img_dir, attr_file, use_native_loader=native))
    ds_zip = CelebA(_cfg(tiny_cfg, zpath, attr_file, use_native_loader=native))
    assert ds_zip.batches == ds_dir.batches
    assert ds_zip.label == ds_dir.label
    for (zi, zc), (di, dc) in zip(ds_zip.epoch_iterator(1), ds_dir.epoch_iterator(1)):
        np.testing.assert_array_equal(zi, di)
        np.testing.assert_array_equal(zc, dc)


def test_zip_native_buffers_match_pil(tiny_cfg, celeba_zip):
    """The native in-memory decoder (lg_loader_load_buffers) is byte-identical
    to PIL on zip members, including through the prefetch pool's thread-local
    ZipFile handles (same contract as test_native_matches_pil_decode)."""
    zpath, attr_file = celeba_zip
    nat = CelebA(_cfg(tiny_cfg, zpath, attr_file, use_native_loader=True))
    pil = CelebA(_cfg(tiny_cfg, zpath, attr_file, use_native_loader=False))
    for (ni, _), (pi, _) in zip(nat.epoch_iterator(0), pil.epoch_iterator(0)):
        np.testing.assert_array_equal(ni, pi)


def test_zip_without_members_refused(tiny_cfg, tmp_path, celeba_tree):
    import zipfile

    _, attr_file, _ = celeba_tree
    zpath = tmp_path / "empty.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("readme.txt", "nothing here")
    with pytest.raises(FileNotFoundError):
        CelebA(_cfg(tiny_cfg, str(zpath), attr_file))


def test_zip_nonsquare_crop_resize_parity(tiny_cfg, tmp_path):
    """Non-square members (the aligned 178x218 geometry, scaled down) decode
    through the zip buffers path with the same center-crop + byte-exact
    bilinear resize as the directory path — native and PIL agree."""
    import zipfile

    from PIL import Image

    rng = np.random.default_rng(7)
    zpath = tmp_path / "arch.zip"
    lines = ["4", " ".join(f"A{i}" for i in range(40))]
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(4):
            arr = rng.integers(0, 255, (44, 36, 3), dtype=np.uint8)  # H, W
            import io as _io

            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG", quality=95)
            z.writestr(f"d/{i:06d}.jpg", buf.getvalue())
            lines.append(f"{i:06d}.jpg " + " ".join("1" for _ in range(40)))
    attr = tmp_path / "attrs.txt"
    attr.write_text("\n".join(lines))
    nat = CelebA(_cfg(tiny_cfg, str(zpath), str(attr), use_native_loader=True))
    pil = CelebA(_cfg(tiny_cfg, str(zpath), str(attr), use_native_loader=False))
    (ni, _), (pi, _) = next(nat.epoch_iterator(0)), next(pil.epoch_iterator(0))
    assert ni.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(ni, pi)


def test_celeba_geometry_structured_zip_join_and_crop(tmp_path, tiny_cfg):
    """Round-4 verdict #8 regression: the celeba-geometry structured ZIP
    (178x218 JPEGs, padded attr file) ingests with the label JOINED to the
    RIGHT image through crop+resize. For every decoded row, each of the
    region bits 0..5 must agree with the parsed label — a one-off label
    shift (the failure the padded attr file could cause) or a wrong crop
    window breaks the agreement immediately."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_structured_data",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "make_structured_data.py"),
    )
    msd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(msd)

    out = tmp_path / "celeba_geom"
    msd.generate(str(out), n=16, geometry="celeba", as_zip=True, attr_rows=400, seed=3)
    attr_lines = open(out / "attrs.txt").read().splitlines()
    assert attr_lines[0] == "400" and len(attr_lines) == 402  # padded + header

    cfg = tiny_cfg.replace(
        image_dim=64,
        init_dim=4,
        batch_size=8,
        image_path=str(out / "img_align.zip"),
        attr_path=str(out / "attrs.txt"),
        attr=[8, 15, 20, 22, 26, 36, 39],
    )
    ds = CelebA(cfg)
    assert ds.num_items == 16  # padded attr rows for absent files are skipped
    img, cond = next(ds.epoch_iterator(0, shuffle=False))
    assert img.shape == (8, 64, 64, 3) and cond.shape == (8, 7)

    # Replicate the generator's deterministic RNG stream to recover each
    # file's ground-truth bits AND pixel content, then check the pipeline's
    # output row-for-row: the label must be soft(bits) of the SAME index
    # (join correctness through the padded attr file) and the image must be
    # the 178-square center crop resized to 64 (crop-window correctness).
    from PIL import Image

    from littlegan_tpu.utils.image import soft as _soft

    gen_rng = np.random.default_rng(3)
    for k in range(8):
        bits = np.where(gen_rng.random(7) < 0.5, -1, 1)
        full = msd.make_celeba_geometry_image(gen_rng, bits)
        np.testing.assert_allclose(cond[k], _soft(bits.astype(np.float32)), atol=1e-6)
        want = np.asarray(
            Image.fromarray(full[20:198]).resize((64, 64), Image.BILINEAR),
            np.float32,
        )
        diff = np.abs(img[k].astype(np.float32) - want) / 255.0
        # JPEG q95 round-trip + decoder resize differences stay small; a
        # wrong crop window (e.g. no crop, or top-anchored) blows this up
        assert diff.mean() < 0.03 and diff.max() < 0.5, (
            f"row {k}: decoded image deviates from expected crop+resize "
            f"(mean {diff.mean():.4f}, max {diff.max():.3f})"
        )


@pytest.mark.slow
def test_attr_parse_at_real_celeba_scale(tmp_path):
    """parse_attr_file at the real file's 202,599-row scale: correct count,
    correct filtered values, and a sane parse time."""
    import time

    n = 202_599
    rng = np.random.default_rng(0)
    rows = rng.choice([-1, 1], size=(n, 40)).astype(np.int64)
    path = tmp_path / "list_attr_celeba.txt"
    with open(path, "w") as f:
        f.write(f"{n}\n" + " ".join(f"A{i}" for i in range(40)) + "\n")
        for i in range(n):
            f.write(f"{i + 1:06d}.jpg " + " ".join(str(v) for v in rows[i]) + "\n")
    t0 = time.monotonic()
    by_name, by_line = parse_attr_file(str(path), [8, 15, 20, 22, 26, 36, 39])
    dt = time.monotonic() - t0
    assert len(by_name) == n and len(by_line) == n
    np.testing.assert_array_equal(by_name["000001.jpg"], rows[0][[8, 15, 20, 22, 26, 36, 39]])
    np.testing.assert_array_equal(by_name[f"{n:06d}.jpg"], rows[-1][[8, 15, 20, 22, 26, 36, 39]])
    assert dt < 60, f"attr parse took {dt:.1f}s at 200k rows"
