"""Tests for the serving API and training utilities."""

import json
import urllib.request

import numpy as np
import pytest


def _fake_engine():
    from ocrs_tpu.engine import DEFAULT_ALPHABET, OcrEngine, OcrEngineParams
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel

    return OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=DEFAULT_ALPHABET[:63],
        )
    )


def _word_image():
    img = np.zeros((100, 200, 3), dtype=np.float32)
    img[30:50, 20:90] = 1.0
    img[30:50, 110:180] = 1.0
    return img


def test_session_lazy_recognition():
    from ocrs_tpu.serve import OcrSession

    session = OcrSession(_fake_engine())
    session.load_image(_word_image())
    detected = session.detect_text()
    assert len(detected) >= 1
    # Recognize only the first line (the extension's lazy pattern).
    result = session.recognize_text(detected[:1])
    assert len(result) == 1
    # Full text then covers all lines.
    assert isinstance(session.get_text(), str)


def test_session_requires_image():
    from ocrs_tpu.serve import OcrSession

    session = OcrSession(_fake_engine())
    with pytest.raises(RuntimeError):
        session.detect_text()


def test_http_server_roundtrip(tmp_path):
    import io

    from PIL import Image

    from ocrs_tpu.serve import serve

    server = serve(_fake_engine(), port=0)  # ephemeral port
    try:
        port = server.server_address[1]
        # healthz
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        buf = io.BytesIO()
        Image.fromarray((_word_image() * 255).astype(np.uint8)).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/ocr", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            doc = json.loads(r.read())
        assert doc["image_height"] == 100 and doc["image_width"] == 200
        assert "paragraphs" in doc

        # probe: garbage body -> clean 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/ocr", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400
    finally:
        server.shutdown()


def test_http_demo_assets_served():
    """GET /demo and /client.mjs serve the browser overlay demo same-origin
    (the extension-class client's no-packaging variant)."""
    import urllib.request

    from ocrs_tpu.serve import serve

    server = serve(_fake_engine(), port=0)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/demo", timeout=60) as r:
            body = r.read().decode()
            assert r.status == 200
            assert "text/html" in r.headers["Content-Type"]
            assert "/client.mjs" in body  # demo imports the served client
        with urllib.request.urlopen(f"{base}/client.mjs", timeout=60) as r:
            assert r.status == 200
            assert "OcrClient" in r.read().decode()
    finally:
        server.shutdown()


def test_http_session_api_lazy_recognition():
    """Session endpoints mirror the wasm OcrEngine lifecycle over HTTP
    (load -> detect -> lazy recognize subset -> full text -> delete)."""
    import io
    import urllib.error

    from PIL import Image

    from ocrs_tpu.serve import serve

    server = serve(_fake_engine(), port=0)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        buf = io.BytesIO()
        Image.fromarray((_word_image() * 255).astype(np.uint8)).save(buf, format="PNG")
        png = buf.getvalue()

        def post(path, data=None):
            req = urllib.request.Request(f"{base}{path}", data=data or b"", method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                body = r.read()
            return json.loads(body) if body.startswith(b"{") else body

        # stateless detect-only
        det = post("/ocr/detect", png)
        assert len(det["lines"]) >= 1
        assert "rect" in det["lines"][0]["words"][0]
        assert len(det["lines"][0]["words"][0]["corners"]) == 8

        # session lifecycle
        sid = post("/session", png)["id"]
        lines = post(f"/session/{sid}/detect")["lines"]
        assert len(lines) >= 1
        # lazy subset: recognize only line 0
        rec = post(
            f"/session/{sid}/recognize", json.dumps({"lines": [0]}).encode()
        )
        assert len(rec["lines"]) == 1 and rec["lines"][0]["index"] == 0
        # full text
        with urllib.request.urlopen(f"{base}/session/{sid}/text", timeout=120) as r:
            assert r.status == 200
        # delete, then the session is gone
        req = urllib.request.Request(f"{base}/session/{sid}", method="DELETE")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["deleted"] is True
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            post(f"/session/{sid}/detect")
        assert exc_info.value.code == 404
    finally:
        server.shutdown()


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from ocrs_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from ocrs_tpu.train.train import (
        init_recognition_state,
        make_mesh,
        make_recognition_train_step,
        shard_batch,
    )

    mesh = make_mesh(1)
    opt = optax.adam(1e-3)
    with mesh:
        state = init_recognition_state(mesh, opt, n_classes=8, hidden=16)
        step = make_recognition_train_step(mesh, opt)
        images = np.zeros((2, 1, 64, 32), np.float32)
        labels = np.ones((2, 2), np.int32)
        lengths = np.full((2,), 2, np.int32)
        state, _ = step(state, *shard_batch(mesh, *map(np.asarray, (images, labels, lengths))))

        path = save_checkpoint(tmp_path, state)
        assert latest_checkpoint(tmp_path) == path

        fresh = init_recognition_state(mesh, opt, n_classes=8, hidden=16)
        restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == int(state.step) == 1
        import jax

        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored state steps again without error
        state2, loss = step(restored, *shard_batch(mesh, *map(np.asarray, (images, labels, lengths))))
        assert np.isfinite(float(loss))


def test_batching_service_shares_recognition_batches():
    """Concurrent submissions must execute as ONE pooled recognition batch
    and produce the same text as the single-image session path."""
    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.serve import BatchingOcrService, OcrSession

    engine = _fake_engine()
    service = BatchingOcrService(
        engine,
        FakeDetectionModel(),
        FakeRecognitionModel(),
        DEFAULT_ALPHABET[:63],
        max_batch=8,
        max_wait_ms=50.0,
    )
    service._gate.clear()  # hold the worker so all submissions coalesce

    # Count detection dispatches: the gated batch of 4 must share ONE
    # padded detection forward (extension batching analog,
    # background.ts:427-434), not run detection per request.
    detect_calls = []
    inner_detect = service._pipeline._detect_tables
    service._pipeline._detect_tables = lambda pages: (
        detect_calls.append(int(pages.shape[0])),
        inner_detect(pages),
    )[1]

    imgs = []
    for k in range(4):
        img = np.zeros((100, 200, 3), dtype=np.float32)
        img[30:50, 20 + 4 * k : 90 + 4 * k] = 1.0
        imgs.append(img)
    futs = [service.submit(img) for img in imgs]
    import time

    time.sleep(0.1)
    service._gate.set()
    results = [f.result(timeout=300) for f in futs]

    assert max(service.batch_sizes) == 4  # one shared batch, not 4 singles
    assert detect_calls == [4]  # ONE detect dispatch for the whole batch
    for img, text_lines in zip(imgs, results):
        session = OcrSession(engine)
        session.load_image(img)
        expected = session.get_text_lines()
        got = "\n".join(str(l) for l in text_lines if l is not None)
        want = "\n".join(str(l) for l in expected if l is not None)
        assert got == want
