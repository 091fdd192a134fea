"""Serving daemon (tools/serve.py): micro-batched HTTP inference over an
exported artifact — concurrent requests share one device call."""
import io
import json
import os
import socket
import sys
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.pipeline import VoteParams

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    from export import build_exported
    rng = np.random.RandomState(0)
    pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
    model = build_model("resnet18_8s", ver_dim=18)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    exp = build_exported(model, variables, pts3d, LINEMOD_K, 4, 64, 64,
                         vote_params=VoteParams(hyp_num=64, max_num=64))
    d = tmp_path_factory.mktemp("export")
    (d / "pipeline.jaxexport").write_bytes(exp.serialize())
    (d / "manifest.json").write_text(json.dumps(
        {"batch": 4, "height": 64, "width": 64, "vn": 9,
         "weights": "random-init"}))
    return str(d)


@pytest.fixture(scope="module")
def server(export_dir):
    import serve as serve_mod
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    started = threading.Event()
    t = threading.Thread(
        target=serve_mod.serve,
        args=(export_dir, "127.0.0.1", port, 15.0, started), daemon=True)
    t.start()
    assert started.wait(60)
    yield f"http://127.0.0.1:{port}"
    started.server.shutdown()


def _post_npy(url, arr, normalized=True):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        url + "/pose", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy",
                 **({"X-Normalized": "1"} if normalized else {})})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["batch"] == 4


def test_single_request(server):
    rng = np.random.RandomState(1)
    out = _post_npy(server, rng.randn(64, 64, 3).astype(np.float32))
    pose = np.asarray(out["pose"])
    kps = np.asarray(out["keypoints"])
    assert pose.shape == (3, 4) and kps.shape == (9, 2)
    assert np.isfinite(pose).all()


def test_concurrent_requests_batched(server):
    rng = np.random.RandomState(2)
    images = [rng.randn(64, 64, 3).astype(np.float32) for _ in range(3)]
    results = [None] * 3
    errs = []

    def worker(i):
        try:
            results[i] = _post_npy(server, images[i])
        except Exception as e:                          # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errs
    for out in results:
        assert np.asarray(out["pose"]).shape == (3, 4)


def test_uint8_image_is_normalized(server):
    # raw uint8 payload goes through ImageNet normalization server-side
    rng = np.random.RandomState(3)
    out = _post_npy(server, rng.randint(0, 255, (64, 64, 3), np.uint8),
                    normalized=False)
    assert np.isfinite(np.asarray(out["pose"])).all()


def test_bad_payload_is_4xx(server):
    req = urllib.request.Request(server + "/pose", data=b"not an image",
                                 headers={"Content-Type": "image/png"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
