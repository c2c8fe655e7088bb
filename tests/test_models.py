import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_tpu.models import nn
from ocrs_tpu.models.detection_net import DetectionModel
from ocrs_tpu.models.recognition_net import DOWNSAMPLE_W, RecognitionModel


def test_detection_model_shapes():
    model = DetectionModel.create(0, input_hw=(64, 96))
    x = jnp.zeros((2, 1, 64, 96), jnp.float32)
    out = model.run(x)
    assert out.shape == (2, 1, 64, 96)
    assert out.dtype == jnp.float32
    vals = np.asarray(out)
    assert (vals >= 0).all() and (vals <= 1).all()
    assert model.input_shape() == ["batch", 1, 64, 96]


def test_recognition_model_shapes():
    n_classes = 97
    model = RecognitionModel.create(0, n_classes=n_classes)
    x = jnp.zeros((2, 1, 64, 128), jnp.float32)
    out = model.run(x)
    assert out.shape == (128 // DOWNSAMPLE_W, 2, n_classes)
    # log-probabilities normalize over classes
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-3
    )


def test_gru_matches_loop_reference():
    key = jax.random.key(1)
    cin, hidden, n, t = 8, 16, 3, 12
    params = nn.gru_init(key, cin, hidden)
    x = jax.random.normal(jax.random.key(2), (n, t, cin), jnp.float32)

    out = nn.gru_apply(params, x)

    # Plain-python reference implementation.
    wx, wh = np.asarray(params["wx"]), np.asarray(params["wh"])
    bx, bh = np.asarray(params["bx"]), np.asarray(params["bh"])
    xn = np.asarray(x)
    h = np.zeros((n, hidden), np.float32)
    outs = []
    for step in range(t):
        xp = xn[:, step] @ wx + bx
        hp = h @ wh + bh
        xr, xz, xnn = np.split(xp, 3, axis=-1)
        hr, hz, hn = np.split(hp, 3, axis=-1)
        r = 1 / (1 + np.exp(-(xr + hr)))
        z = 1 / (1 + np.exp(-(xz + hz)))
        nv = np.tanh(xnn + r * hn)
        h = (1 - z) * nv + z * h
        outs.append(h)
    ref = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=2e-2, atol=2e-2)


def test_bigru_reverse_direction():
    key = jax.random.key(3)
    params = nn.gru_init(key, 4, 8)
    x = jax.random.normal(jax.random.key(4), (2, 6, 4), jnp.float32)
    fwd = nn.gru_apply(params, x)
    bwd = nn.gru_apply(params, jnp.flip(x, axis=1), reverse=False)
    bwd_direct = nn.gru_apply(params, x, reverse=True)
    np.testing.assert_allclose(
        np.asarray(jnp.flip(bwd, axis=1)), np.asarray(bwd_direct), rtol=1e-5, atol=1e-5
    )


def test_engine_with_real_models_runs():
    """The full pipeline runs with randomly-initialized real architectures."""
    from ocrs_tpu.engine import OcrEngine, OcrEngineParams
    from ocrs_tpu.preprocess import DimOrder, ImageSource

    engine = OcrEngine(
        OcrEngineParams(
            detection_model=DetectionModel.create(0, input_hw=(64, 96)),
            recognition_model=RecognitionModel.create(0),
        )
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 80, 3), dtype=np.uint8)
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.HWC))
    words = engine.detect_words(inp)  # untrained: arbitrary but must not crash
    lines = engine.find_text_lines(inp, words)
    result = engine.recognize_text(inp, lines)
    assert len(result) == len(lines)


def test_convctc_shapes_and_padding_invariance():
    """The conv-only recognizer must (a) keep the [W/4, N, C] contract and
    (b) be exactly invariant to right-padding length at every content frame
    whose receptive field stays inside real pixels — the structural
    improvement over the BiGRU for the width-bucket/padding interaction
    flagged in round-1 ADVICE. (Frames within ~RF/2 of the array edge see
    the conv zero-pad boundary instead of BLACK pixels and may differ;
    training with randomized padding covers those.)"""
    import jax

    from ocrs_tpu.models import recognition_net as rn

    params = rn.conv_init_params(jax.random.key(0), n_classes=97)
    rng = np.random.default_rng(0)
    content = rng.random((1, 1, 64, 128)).astype(np.float32) - 0.5
    out = np.asarray(rn.conv_apply(params, content))
    assert out.shape == (32, 1, 97)

    short = np.full((1, 1, 64, 256), -0.5, np.float32)
    long = np.full((1, 1, 64, 640), -0.5, np.float32)
    short[..., :128] = content
    long[..., :128] = content
    # Frames 0..15 (input px 0..64) have their full ~340px receptive field
    # inside the 256px-wide short input: exact equality required.
    o_short = np.asarray(rn.conv_apply(params, short))[:16]
    o_long = np.asarray(rn.conv_apply(params, long))[:16]
    np.testing.assert_allclose(o_short, o_long, atol=1e-5)


def test_recognition_model_arch_roundtrip(tmp_path):
    """Weights saved with an arch record load back into the right apply fn."""
    import jax

    from ocrs_tpu.models import recognition_net as rn
    from ocrs_tpu.models.weights import load_recognition_model, save_params

    params = rn.conv_init_params(jax.random.key(1), n_classes=24)
    path = tmp_path / "rec.npz"
    save_params(path, params, meta={"kind": "recognition", "arch": "convctc"})
    model = load_recognition_model(path)
    assert model.arch == "convctc"
    out = model.run(np.zeros((1, 1, 64, 64), np.float32))
    assert out.shape == (16, 1, 24)
