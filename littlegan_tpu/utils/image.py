"""Image/label utilities.

Capability parity with reference utils.py:6-56:
- ``soft``: label smoothing ``0.96*x + 0.02`` (reference: utils.py:47-48).
  Applied to +-1 attribute labels this yields {-0.94, 0.98} — a quirk the
  reference training depends on (SURVEY appendix), preserved exactly.
- ``data_rescale`` / ``inverse_rescale``: uint8 [0,255] <-> [-1,1]
  (reference: utils.py:51-56; inverse rounds before cast).
- ``save_image`` / ``to_grid``: near-square (or explicit) tiled grids saved
  via PIL (reference: utils.py:6-44). Grid assembly here is vectorized
  (einops-style reshape) instead of the reference's per-image Python loop.

These are host-side utilities; ``soft``/``data_rescale`` are also safe to use
on traced JAX arrays inside jitted code (pure elementwise math).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def soft(x):
    """Label smoothing (reference: utils.py:47-48)."""
    return 0.96 * x + 0.02


def data_rescale(x):
    """[0,255] -> [-1,1] (reference: utils.py:51-52)."""
    return x / 127.5 - 1.0


def inverse_rescale(y):
    """[-1,1] -> rounded [0,255] (reference: utils.py:55-56)."""
    return np.round((np.asarray(y, dtype=np.float32) + 1.0) * 127.5)


def ensure_pm1(images: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> f32 [-1,1]; [-1,1] floats pass through.

    The pipeline ships uint8 by default (device-side rescale in the train
    step); host-side consumers (predict, fixtures, sampling modes) call this
    to get the reference's [-1,1] contract.
    """
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return data_rescale(arr.astype(np.float32)).astype(np.float32)
    return arr


def _grid_dims(n: int, shape: Tuple[Optional[int], Optional[int]]) -> Tuple[int, int]:
    """Resolve (rows, cols) like reference utils.py:16-22.

    The reference names them (width, height); ``width`` counts tiles along the
    first (vertical) output axis. None/None -> near-square.
    """
    rows, cols = shape
    if rows is None and cols is None:
        cols = int(np.ceil(np.sqrt(n)))
    if rows is None:
        rows = int(np.ceil(n / cols))
    if cols is None:
        cols = int(np.ceil(n / rows))
    return rows, cols


def to_grid(batch: np.ndarray, shape: Tuple[Optional[int], Optional[int]] = (None, None)) -> np.ndarray:
    """Tile a NHWC uint8 batch into one HWC image (reference: utils.py:16-31).

    Layout matches the reference exactly: image ``index`` lands at tile
    (row = index % rows, col = index // rows) — i.e. fills columns downward.
    """
    n, h, w, c = batch.shape
    rows, cols = _grid_dims(n, shape)
    pad = rows * cols - n
    if pad:
        batch = np.concatenate([batch, np.zeros((pad, h, w, c), batch.dtype)])
    # index fills columns downward (index % rows, index // rows), so the
    # column axis is the SLOW reshape axis; one transpose replaces the
    # reference's per-image copy loop (utils.py:24-31)
    return (
        batch.reshape(cols, rows, h, w, c)
        .transpose(1, 2, 0, 3, 4)
        .reshape(rows * h, cols * w, c)
    )


def save_image(image, path: Optional[str] = None, shape: Tuple[Optional[int], Optional[int]] = (None, None)):
    """Save a [-1,1] image or batch as a tiled uint8 JPEG (reference: utils.py:6-44).

    3D input -> single image; 4D input -> tiled grid. ``path=None`` shows the
    image interactively like the reference (utils.py:41-42). uint8 input is
    taken as already-quantized [0,255] pixels (the fused sample path
    quantizes on DEVICE with the identical round((y+1)*127.5)) and passes
    through untouched.
    """
    from PIL import Image  # local import: keep jit-side modules PIL-free

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = inverse_rescale(arr).astype(np.uint8)
    if arr.ndim == 4:
        arr = to_grid(arr, shape)
    if arr.shape[2] == 1:
        img = Image.fromarray(arr[:, :, 0], "L")
    else:
        img = Image.fromarray(arr, "RGB")
    if path is None:
        img.show()
        return img
    img.save(path)
    return img


class BatchImageWriter:
    """Thread-pooled ``save_image`` for bulk writers.

    ``evaluate-sample`` writes 30k+ JPEGs (reference main.py:58-81 does this
    serially); PIL's JPEG encoder releases the GIL, so a small pool overlaps
    encode+disk IO with the device generating the next batch. Submission is
    bounded (``max_pending``) so a fast producer cannot pile unencoded
    batches in RAM; worker errors re-raise on a later ``save``/``close`` —
    never dropped. Use as a context manager; exit waits for all writes.
    """

    def __init__(self, workers: int = 8, max_pending: Optional[int] = None):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="imgwrite")
        self._pending = deque()
        self._max = max_pending if max_pending is not None else workers * 4

    def save(self, image, path: str, shape: Tuple[Optional[int], Optional[int]] = (None, None)):
        self._drain(block=len(self._pending) >= self._max)
        self._pending.append(self._pool.submit(save_image, np.asarray(image), path, shape))

    def _drain(self, block: bool) -> None:
        while self._pending and (block or self._pending[0].done()):
            self._pending.popleft().result()  # re-raises a worker's error
            block = False

    def close(self) -> None:
        try:
            while self._pending:
                self._pending.popleft().result()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        if exc[0] is None:
            self.close()  # surface pending write errors on clean exit
        else:  # already unwinding: don't mask the original exception
            self._pending.clear()
            self._pool.shutdown(wait=True)
