"""Serving tests: AOT engine padding/latency contract + HTTP API end-to-end."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from littlegan_tpu.serving import InferenceEngine, make_handler


@pytest.fixture(scope="module")
def engine(tiny_cfg):
    return InferenceEngine(tiny_cfg.replace(restore=False), batch_size=4)


def test_generate_pads_small_requests(engine):
    cond = np.zeros((2, engine.cfg.cond_dim), np.float32)
    imgs = engine.generate(cond, seed=1)
    assert imgs.shape == (2, 16, 16, 3)
    # deterministic for a fixed seed
    np.testing.assert_array_equal(imgs, engine.generate(cond, seed=1))


def test_generate_rejects_oversized(engine):
    with pytest.raises(ValueError):
        engine.generate(np.zeros((5, engine.cfg.cond_dim), np.float32))


def test_adjust_and_discriminate(engine):
    img = np.random.default_rng(0).uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    cond = np.zeros((3, engine.cfg.cond_dim), np.float32)
    adj = engine.adjust(img, cond)
    assert adj.shape == img.shape
    d = engine.discriminate(img)
    assert d["pr"].shape == (3, 1) and d["cond"].shape == (3, engine.cfg.cond_dim)


@pytest.fixture(scope="module")
def http_server(engine):
    from http.server import HTTPServer

    server = HTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_http_healthz(http_server):
    with urllib.request.urlopen(http_server + "/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"


def test_http_generate(http_server, engine):
    status, out = _post(
        http_server + "/generate", {"cond": [[0, 0, 0, 0, 0, 1, 0]], "seed": 3}
    )
    assert status == 200
    assert len(out["images"]) == 1 and out["latency_ms"] >= 0
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
    assert img.size == (16, 16)


def test_http_adjust_roundtrip(http_server, engine):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "PNG")
    status, out = _post(
        http_server + "/adjust",
        {"image_b64": base64.b64encode(buf.getvalue()).decode(), "cond": [[1, 0, 0, 0, 0, 0, 0]]},
    )
    assert status == 200 and len(out["images"]) == 1


def test_http_bad_request(http_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/generate", {"wrong": 1})
    assert e.value.code == 400


def test_generate_rejects_mismatched_noise(engine):
    cond = np.zeros((3, engine.cfg.cond_dim), np.float32)
    noise = np.zeros((2, engine.cfg.noise_dim), np.float32)
    with pytest.raises(ValueError):
        engine.generate(cond, noise)


def test_greyscale_image_codecs_roundtrip():
    """1-channel configs must survive the HTTP JPEG codec path (PIL mode L)."""
    from littlegan_tpu.serving import _b64_to_img, _img_to_b64

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (16, 16, 1)).astype(np.float32)
    b64 = _img_to_b64(img)
    back = _b64_to_img(b64, 16, channels=1)
    assert back.shape == (16, 16, 1)
    assert np.abs(back - img).mean() < 0.15  # JPEG-lossy but same image


def test_dynamic_batcher_batches_and_matches_direct(tiny_cfg, tmp_path):
    """8 concurrent single-image requests must produce the same images as
    direct per-request engine calls AND ride fewer engine invocations."""
    import threading

    from littlegan_tpu.serving import DynamicBatcher, InferenceEngine

    cfg = tiny_cfg.replace(
        all_result_dir=str(tmp_path / "result"), test_data_dir=str(tmp_path / "td"),
        exp_name="srv", restore=False,
    )
    engine = InferenceEngine(cfg, batch_size=8)
    calls = []
    real_generate = engine.generate
    engine.generate = lambda c, n=None, seed=0: (calls.append(1), real_generate(c, n, seed))[1]

    rng = np.random.default_rng(0)
    noise = rng.normal(size=(8, cfg.noise_dim)).astype(np.float32)
    cond = np.where(rng.random((8, cfg.cond_dim)) < 0.5, 0.98, -0.94).astype(np.float32)
    direct = real_generate(cond, noise)

    batcher = DynamicBatcher(  # wide window: one batch
        lambda n, c: engine.generate(c, n), engine.batch, max_wait_ms=200.0
    )
    try:
        results = [None] * 8
        def worker(i):
            results[i] = batcher.submit(noise[i], cond[i])
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        batcher.close()
    assert all(r is not None for r in results)
    for i in range(8):
        np.testing.assert_allclose(results[i], direct[i], rtol=1e-5, atol=1e-6)
    assert len(calls) < 8, f"batcher made {len(calls)} engine calls for 8 requests"


def test_http_concurrent_generate_with_batcher(engine):
    """Concurrent single-image POSTs through ThreadingHTTPServer + batcher."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from littlegan_tpu.serving import close_batchers, make_batchers, make_handler

    batchers = make_batchers(engine, max_wait_ms=100.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, batchers))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}/generate"
        results = [None] * 4
        def worker(i):
            results[i] = _post(url, {"cond": [[0.98] * engine.cfg.cond_dim], "seed": i})
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert all(r is not None and r[0] == 200 and len(r[1]["images"]) == 1 for r in results)
        # distinct seeds -> distinct images
        assert len({r[1]["images"][0] for r in results}) == 4
    finally:
        server.shutdown()
        close_batchers(batchers)


def test_batcher_bad_row_does_not_poison_batch(engine):
    """A malformed row in a dynamic batch must fail alone; batch-mates get
    their images."""
    import threading

    from littlegan_tpu.serving import DynamicBatcher

    batcher = DynamicBatcher(
        lambda n, c: engine.generate(c, n), engine.batch, max_wait_ms=200.0
    )
    try:
        good_noise = np.zeros((engine.cfg.noise_dim,), np.float32)
        good_cond = np.zeros((engine.cfg.cond_dim,), np.float32)
        bad_cond = np.zeros((engine.cfg.cond_dim + 3,), np.float32)  # wrong width
        results = {}
        def worker(key, noise, cond):
            try:
                results[key] = batcher.submit(noise, cond)
            except Exception as e:
                results[key] = e
        threads = [
            threading.Thread(target=worker, args=("good", good_noise, good_cond)),
            threading.Thread(target=worker, args=("bad", good_noise, bad_cond)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        batcher.close()
    assert isinstance(results["good"], np.ndarray)
    assert isinstance(results["bad"], Exception)


def test_adjust_and_discriminate_batch_concurrent_requests(engine):
    """Round-2 verdict #7: concurrent single-image /adjust and /discriminate
    requests must share one device call each (previously every request paid
    a full padded AOT call)."""
    import threading

    from littlegan_tpu.serving import close_batchers, make_batchers

    adj_calls, disc_calls = [], []
    real_adjust, real_disc = engine.adjust, engine.discriminate
    engine.adjust = lambda i, c: (adj_calls.append(1), real_adjust(i, c))[1]
    engine.discriminate = lambda i: (disc_calls.append(1), real_disc(i))[1]
    batchers = make_batchers(engine, max_wait_ms=200.0)  # wide window: one batch
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    conds = np.where(rng.random((4, engine.cfg.cond_dim)) < 0.5, 0.98, -0.94).astype(np.float32)
    try:
        direct_adj = real_adjust(imgs, conds)
        direct_disc = real_disc(imgs)
        adj_res, disc_res = [None] * 4, [None] * 4

        def adj_worker(i):
            adj_res[i] = batchers["adjust"].submit(imgs[i], conds[i])

        def disc_worker(i):
            disc_res[i] = batchers["discriminate"].submit(imgs[i])

        threads = [threading.Thread(target=adj_worker, args=(i,)) for i in range(4)]
        threads += [threading.Thread(target=disc_worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        close_batchers(batchers)
        engine.adjust, engine.discriminate = real_adjust, real_disc
    for i in range(4):
        np.testing.assert_allclose(adj_res[i], direct_adj[i], rtol=1e-5, atol=1e-6)
        pr, cond = disc_res[i]
        np.testing.assert_allclose(pr, direct_disc["pr"][i], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cond, direct_disc["cond"][i], rtol=1e-5, atol=1e-6)
    # +1 each for the direct reference call above
    assert len(adj_calls) < 5, f"adjust made {len(adj_calls)} engine calls for 4 requests"
    assert len(disc_calls) < 5, f"discriminate made {len(disc_calls)} engine calls"


def test_http_adjust_and_discriminate_through_batcher(engine):
    """HTTP layer drives /adjust and /discriminate through their batchers."""
    import threading
    from http.server import ThreadingHTTPServer

    from PIL import Image

    from littlegan_tpu.serving import close_batchers, make_batchers, make_handler

    batchers = make_batchers(engine, max_wait_ms=30.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, batchers))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    try:
        status, out = _post(
            f"http://127.0.0.1:{port}/adjust",
            {"image_b64": b64, "cond": [[1, 0, 0, 0, 0, 0, 0]]},
        )
        assert status == 200 and len(out["images"]) == 1
        status, out = _post(f"http://127.0.0.1:{port}/discriminate", {"image_b64": b64})
        assert status == 200
        assert np.shape(out["pr"]) == (1, 1)
        assert np.shape(out["cond"]) == (1, engine.cfg.cond_dim)
    finally:
        server.shutdown()
        close_batchers(batchers)


def test_generate_without_seed_draws_fresh_entropy(engine):
    """No seed and no noise -> per-request entropy: two bare /generate calls
    must NOT return the identical sample (a generative endpoint returning
    one fixed image to every client was the former seed=0 default). Explicit
    seeds stay reproducible (test_generate_pads_small_requests)."""
    cond = np.zeros((1, engine.cfg.cond_dim), np.float32)
    a = engine.generate(cond)
    b = engine.generate(cond)
    assert not np.array_equal(a, b)


def test_serving_restores_ema_weights_from_train_checkpoint(tiny_cfg, tmp_path):
    """A serving config WITHOUT ema_decay pointed at an EMA training run must
    still serve the EMA generator weights (what predict/export use) — the
    naive template restore silently drops the checkpoint's ema/* arrays."""
    import os

    import jax

    from littlegan_tpu.serving import InferenceEngine
    from littlegan_tpu.training.checkpoint import make_checkpointer
    from littlegan_tpu.training.state import create_train_state, eval_params

    train_cfg = tiny_cfg.replace(
        ema_decay=0.999, exp_name="ema_srv",
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
    )
    state = create_train_state(train_cfg, jax.random.PRNGKey(0))
    # make the EMA subtrees visibly different from the live weights
    state = state._replace(
        ema=jax.tree_util.tree_map(lambda x: x + 1.0, state.ema)
    )
    ckdir = os.path.join(train_cfg.result_dir, "checkpoint")
    make_checkpointer(train_cfg, ckdir).save("1", state, {"epoch": 2, "step": 4})

    serve_cfg = train_cfg.replace(ema_decay=0.0, restore=True)  # user forgot ema
    engine = InferenceEngine(serve_cfg, batch_size=2)
    want = eval_params(state)
    got_leaf = np.asarray(engine.params["out_conv"]["kernel"])
    np.testing.assert_array_equal(got_leaf, np.asarray(want["out_conv"]["kernel"]))


# ----------------------------------------------------------- /metrics ----


def test_server_metrics_render_unit():
    """ServerMetrics bucket semantics: latency histograms are cumulative
    (a 3 ms request lands in le=5 and every wider bucket, not le=2.5);
    batch-fill histograms bucket by rows-per-dispatch."""
    from littlegan_tpu.serving import ServerMetrics

    m = ServerMetrics(engine_batch=4)
    m.request_started(); m.request_finished("generate", 200, 3.0)
    m.request_started(); m.request_finished("generate", 200, 30.0)
    m.request_started(); m.request_finished("generate", 400, 0.5)
    m.batch_dispatched("generate", 1)
    m.batch_dispatched("generate", 4)
    text = m.render()
    assert 'littlegan_requests_total{endpoint="generate",code="200"} 2' in text
    assert 'littlegan_requests_total{endpoint="generate",code="400"} 1' in text
    # cumulative latency buckets: 0.5 -> le=1; 3.0 -> le=5; 30.0 -> le=50
    assert 'littlegan_request_latency_ms_bucket{endpoint="generate",le="1"} 1' in text
    assert 'littlegan_request_latency_ms_bucket{endpoint="generate",le="5"} 2' in text
    assert 'littlegan_request_latency_ms_bucket{endpoint="generate",le="50"} 3' in text
    assert 'littlegan_request_latency_ms_bucket{endpoint="generate",le="+Inf"} 3' in text
    assert 'littlegan_request_latency_ms_count{endpoint="generate"} 3' in text
    # batch fill: one 1-row dispatch, one full 4-row dispatch
    assert 'littlegan_batch_fill_bucket{endpoint="generate",le="1"} 1' in text
    assert 'littlegan_batch_fill_bucket{endpoint="generate",le="4"} 2' in text
    assert 'littlegan_batch_rows_total{endpoint="generate"} 5' in text
    assert 'littlegan_batch_dispatches_total{endpoint="generate"} 2' in text
    assert "littlegan_inflight_requests 0" in text
    assert "littlegan_engine_batch 4" in text


def test_http_metrics_endpoint(engine):
    """GET /metrics returns Prometheus text reflecting served requests."""
    import threading
    from http.server import ThreadingHTTPServer

    from littlegan_tpu.serving import ServerMetrics, close_batchers, make_batchers, make_handler

    metrics = ServerMetrics(engine.batch)
    batchers = make_batchers(engine, max_wait_ms=30.0, metrics=metrics)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(engine, batchers, metrics)
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        status, out = _post(url + "/generate", {"cond": [[0.98] * engine.cfg.cond_dim], "seed": 7})
        assert status == 200
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):  # 400 must be counted too
            _post(url + "/generate", {"wrong": 1})
        # request_finished lands in do_POST's finally AFTER the reply bytes
        # hit the socket, so a scrape racing the handler thread can run a
        # beat early — poll until both counters are visible (bounded)
        deadline = time.monotonic() + 5.0
        while True:
            with urllib.request.urlopen(url + "/metrics") as r:
                assert r.status == 200
                assert r.headers["Content-Type"].startswith("text/plain")
                text = r.read().decode()
            if (
                'littlegan_request_latency_ms_count{endpoint="generate"} 2' in text
                or time.monotonic() > deadline
            ):
                break
            time.sleep(0.01)
        assert 'littlegan_requests_total{endpoint="generate",code="200"} 1' in text
        assert 'littlegan_requests_total{endpoint="generate",code="400"} 1' in text
        assert 'littlegan_request_latency_ms_count{endpoint="generate"} 2' in text
        # the single-row generate rode the batcher: one 1-row dispatch
        assert 'littlegan_batch_dispatches_total{endpoint="generate"} 1' in text
        assert 'littlegan_batch_rows_total{endpoint="generate"} 1' in text
        assert f"littlegan_engine_batch {engine.batch}" in text
    finally:
        server.shutdown()
        close_batchers(batchers)


def test_metrics_absent_without_wiring(http_server):
    """The bare handler (no metrics object) keeps /metrics a 404 — the
    endpoint never serves an empty scrape that hides a wiring mistake."""
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(http_server + "/metrics")
    assert e.value.code == 404


@pytest.mark.slow
def test_serve_drains_on_sigterm(tmp_path):
    """serve() under a real SIGTERM: stops accepting, closes batchers and
    the socket, exits the serve_forever loop (production supervisor drain).
    Fresh subprocess: signal handlers only install in a main thread."""
    import signal
    import subprocess
    import sys
    import time as _time

    script = f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax; jax.config.update("jax_platforms", "cpu")
from littlegan_tpu.config import Config
from littlegan_tpu.serving import serve
cfg = Config(batch_size=2, image_dim=16, init_dim=1, noise_dim=13,
             attr=[0,1,2,3,4,5,6], conv_filter=[24,16,12,8,4], kernel_size=5,
             compute_dtype="float32", debug=True, restore=False,
             all_result_dir={str(tmp_path / 'result')!r},
             test_data_dir={str(tmp_path / 'td')!r})
serve(cfg, host="127.0.0.1", port=0, batch_size=2, max_wait_ms=3.0)
print("SERVE_RETURNED", flush=True)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo",
    )
    try:
        # wait for the server banner (engine AOT compile included)
        deadline = _time.monotonic() + 240
        lines = []
        while _time.monotonic() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if "serving on" in line:
                break
        else:
            raise AssertionError(f"server never came up: {lines}")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "drained, socket closed" in out, out
    assert "SERVE_RETURNED" in out, out
    assert proc.returncode == 0


# ----------------------------------------------- hot reload + demo page ----


def _reload_cfg(tiny_cfg, tmp_path, **kw):
    kw.setdefault("restore", True)
    return tiny_cfg.replace(
        exp_name="hotreload",
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "td"),
        **kw,
    )


def test_hot_reload_swaps_new_checkpoint(tiny_cfg, tmp_path):
    """A new checkpoint tag appearing after engine start swaps the served
    weights in place — same AOT programs, new outputs."""
    import os

    import jax

    from littlegan_tpu.models import init_params
    from littlegan_tpu.training.checkpoint import make_checkpointer

    cfg = _reload_cfg(tiny_cfg, tmp_path)
    ck = make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint"))
    p1 = init_params(cfg, jax.random.PRNGKey(1))
    ck.save("1", p1)
    engine = InferenceEngine(cfg, batch_size=2)
    cond = np.zeros((1, cfg.cond_dim), np.float32)
    out1 = engine.generate(cond, seed=0)
    assert engine.maybe_reload() is None  # nothing new: no swap

    p2 = init_params(cfg, jax.random.PRNGKey(2))
    ck.save("2", p2)
    assert engine.maybe_reload() == "checkpoint/2"
    np.testing.assert_array_equal(
        np.asarray(engine.params["out_conv"]["kernel"]),
        np.asarray(p2["out_conv"]["kernel"]),
    )
    out2 = engine.generate(cond, seed=0)
    assert not np.array_equal(out1, out2)  # same seed, new weights
    assert engine.maybe_reload() is None  # idempotent until the next save


def test_hot_reload_sees_same_tag_overwrite(tiny_cfg, tmp_path):
    """Re-running export-model rewrites the FIXED tag 'model'; the mtime
    fingerprint must catch the overwrite even though the tag is unchanged."""
    import os
    import time as _time

    import jax

    from littlegan_tpu.models import init_params
    from littlegan_tpu.training.checkpoint import make_checkpointer

    cfg = _reload_cfg(tiny_cfg, tmp_path)
    ck = make_checkpointer(cfg, os.path.join(cfg.result_dir, "model"))
    ck.save("model", init_params(cfg, jax.random.PRNGKey(1)))
    engine = InferenceEngine(cfg, batch_size=2)
    assert engine.maybe_reload() is None

    p2 = init_params(cfg, jax.random.PRNGKey(2))
    path = ck.save("model", p2)
    # force a visible mtime change (same-second overwrites must still count)
    st = os.stat(path)
    os.utime(path, (st.st_atime, st.st_mtime + 2))
    assert engine.maybe_reload() == "model/model"
    np.testing.assert_array_equal(
        np.asarray(engine.params["out_conv"]["kernel"]),
        np.asarray(p2["out_conv"]["kernel"]),
    )


def test_hot_reload_refuses_fresh_init_engine(tiny_cfg, tmp_path):
    """restore=false is an explicit fresh-init serve: a checkpoint appearing
    later must NOT be picked up."""
    import os

    import jax

    from littlegan_tpu.models import init_params
    from littlegan_tpu.training.checkpoint import make_checkpointer

    cfg = _reload_cfg(tiny_cfg, tmp_path, restore=False)
    engine = InferenceEngine(cfg, batch_size=2)
    before = np.asarray(engine.params["out_conv"]["kernel"]).copy()
    make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint")).save(
        "1", init_params(cfg, jax.random.PRNGKey(9))
    )
    assert engine.maybe_reload() is None
    np.testing.assert_array_equal(
        np.asarray(engine.params["out_conv"]["kernel"]), before
    )


def test_metrics_checkpoint_lines():
    from littlegan_tpu.serving import ServerMetrics

    m = ServerMetrics(engine_batch=4)
    text = m.render()
    assert "littlegan_checkpoint_reloads_total 0" in text
    assert "littlegan_checkpoint_info" not in text  # no tag known yet
    m.checkpoint_loaded("checkpoint/1", reload=False)  # startup load
    m.checkpoint_loaded("checkpoint/2")  # hot reload
    text = m.render()
    assert "littlegan_checkpoint_reloads_total 1" in text
    assert 'littlegan_checkpoint_info{tag="checkpoint/2"} 1' in text


def test_demo_page_served(http_server, engine):
    """GET / returns the built-in demo UI wired to the three endpoints."""
    with urllib.request.urlopen(http_server + "/") as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        html = r.read().decode()
    for needle in ("littlegan-tpu", "/generate", "/adjust", "/discriminate"):
        assert needle in html
    # one toggle per configured attribute, labeled with the CelebA name
    from littlegan_tpu.data import CELEBA_ATTR_NAMES

    assert html.count('class="attr"') == engine.cfg.cond_dim
    assert CELEBA_ATTR_NAMES[engine.cfg.attr[0]] in html


# ------------------------------------------------------- multi-chip engine ----


def test_engine_dp_matches_single_device(tiny_cfg):
    """devices=N shards every engine call row-wise over the local mesh with
    value-equivalent results (per-sample outputs are independent): generate /
    adjust / discriminate agree with the single-device AOT engine on the
    same params."""
    import jax

    from littlegan_tpu.models import init_params

    cfg = tiny_cfg.replace(restore=False, batch_size=8)
    params = init_params(cfg, jax.random.PRNGKey(0))
    single = InferenceEngine(cfg, params=params, batch_size=8)
    dp = InferenceEngine(cfg, params=params, batch_size=8, devices=jax.device_count())
    assert dp.n_devices == jax.device_count() > 1

    rng = np.random.default_rng(5)
    noise = rng.normal(size=(8, cfg.noise_dim)).astype(np.float32)
    cond = rng.choice([-0.94, 0.98], size=(8, cfg.cond_dim)).astype(np.float32)
    img = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)

    np.testing.assert_allclose(
        dp.generate(cond, noise), single.generate(cond, noise), atol=2e-6
    )
    np.testing.assert_allclose(dp.adjust(img, cond), single.adjust(img, cond), atol=2e-6)
    ds, dd = single.discriminate(img), dp.discriminate(img)
    np.testing.assert_allclose(dd["pr"], ds["pr"], atol=2e-6)
    np.testing.assert_allclose(dd["cond"], ds["cond"], atol=2e-6)

    # ragged request rows still pad/slice through the sharded call
    np.testing.assert_allclose(
        dp.generate(cond[:3], noise[:3]), single.generate(cond[:3], noise[:3]), atol=2e-6
    )


def test_engine_dp_auto_and_divisibility(tiny_cfg):
    """devices=0 resolves to every local chip; an indivisible batch is
    refused at construction with remediation text."""
    import jax

    cfg = tiny_cfg.replace(restore=False, batch_size=8)
    auto = InferenceEngine(cfg, batch_size=8, devices=0)
    assert auto.n_devices == jax.device_count()
    with pytest.raises(ValueError, match="divisible"):
        InferenceEngine(cfg, batch_size=6, devices=4)


def test_hot_reload_under_dp_engine(tiny_cfg, tmp_path):
    """devices=N engines reload too: the DP wrapper's identity-keyed cache
    replicates the NEW tree on the next call (and the outputs change)."""
    import os

    import jax

    from littlegan_tpu.models import init_params
    from littlegan_tpu.training.checkpoint import make_checkpointer

    cfg = _reload_cfg(tiny_cfg, tmp_path, batch_size=8)
    ck = make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint"))
    ck.save("1", init_params(cfg, jax.random.PRNGKey(1)))
    engine = InferenceEngine(cfg, batch_size=8, devices=jax.device_count())
    cond = np.zeros((1, cfg.cond_dim), np.float32)
    out1 = engine.generate(cond, seed=0)

    ck.save("2", init_params(cfg, jax.random.PRNGKey(2)))
    assert engine.maybe_reload() == "checkpoint/2"
    out2 = engine.generate(cond, seed=0)
    assert not np.array_equal(out1, out2)  # same seed, new replicated weights

    # and the reloaded DP engine matches a fresh single-device engine
    single = InferenceEngine(cfg, batch_size=8)
    np.testing.assert_allclose(out2, single.generate(cond, seed=0), atol=2e-6)
