"""Multi-device sharding tests (run on the 8-virtual-CPU-device mesh)."""

import numpy as np
import pytest

import jax

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 2,
    reason="needs >=2 devices (xla_force_host_platform_device_count)",
)


@needs_devices
def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(len(jax.devices()))


@needs_devices
def test_sharded_pipeline_matches_unsharded():
    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.parallel.pipeline import PagePipeline
    from ocrs_tpu.parallel.sharding import make_data_mesh

    rng = np.random.default_rng(0)
    # 8 small pages with a white word block each (fake detector sees them).
    pages = np.zeros((8, 100, 200), dtype=np.float32)
    for i in range(8):
        pages[i, 30:50, 20 + 5 * i : 90 + 5 * i] = 1.0

    alphabet = DEFAULT_ALPHABET[:63]

    def make(mesh):
        return PagePipeline(
            FakeDetectionModel(),
            FakeRecognitionModel(),
            alphabet,
            max_lines_per_batch=8,
            mesh=mesh,
        )

    plain = make(None).process(pages)
    mesh = make_data_mesh()
    sharded = make(mesh).process(pages)

    assert len(plain) == len(sharded) == 8
    for a, b in zip(plain, sharded):
        assert a.text == b.text
        assert len(a.words) == len(b.words)


def test_process_stream_matches_per_group_process():
    """The software-pipelined stream (upload N+2 / detect N+1 / finish N in
    flight simultaneously) must produce exactly the per-group results of
    serial process() calls, in order."""
    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.parallel.pipeline import PagePipeline

    groups = []
    for g in range(3):
        pages = np.zeros((4, 100, 200), dtype=np.float32)
        for i in range(4):
            pages[i, 30:50, 20 + 5 * (g + i) : 90 + 5 * (g + i)] = 1.0
        groups.append(pages)

    pipe = PagePipeline(
        FakeDetectionModel(),
        FakeRecognitionModel(),
        DEFAULT_ALPHABET[:63],
        max_lines_per_batch=8,
    )
    serial = [pipe.process(g) for g in groups]
    streamed = pipe.process_stream(groups)
    assert len(streamed) == len(serial) == 3
    for sg, tg in zip(serial, streamed):
        assert len(sg) == len(tg)
        for a, b in zip(sg, tg):
            assert a.text == b.text
            assert len(a.words) == len(b.words)


def test_pipeline_matches_engine_all_decode_configs():
    """The pooled multi-page pipeline must produce the same text as the
    single-image engine on the same pages for every decode configuration
    (greedy, beam, allowed-chars masking) — VERDICT round-1 parity gap."""
    from ocrs_tpu.engine import OcrEngine, OcrEngineParams
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.parallel.pipeline import PagePipeline
    from ocrs_tpu.preprocess import DimOrder, ImageSource
    from ocrs_tpu.recognition import BeamSearch, Greedy

    from ocrs_tpu.engine import DEFAULT_ALPHABET

    alphabet = DEFAULT_ALPHABET[:63]
    pages = np.zeros((2, 100, 200), dtype=np.float32)
    pages[0, 30:50, 20:90] = 1.0
    pages[1, 40:60, 30:110] = 1.0

    configs = [
        dict(decode_method=Greedy(), allowed_chars=None),
        dict(decode_method=BeamSearch(width=8), allowed_chars=None),
        dict(decode_method=Greedy(), allowed_chars=alphabet[:40]),
    ]
    for cfg in configs:
        engine = OcrEngine(
            OcrEngineParams(
                detection_model=FakeDetectionModel(),
                recognition_model=FakeRecognitionModel(),
                alphabet=alphabet,
                decode_method=cfg["decode_method"],
                allowed_chars=cfg["allowed_chars"],
            )
        )
        pipe = PagePipeline(
            FakeDetectionModel(),
            FakeRecognitionModel(),
            alphabet,
            max_lines_per_batch=8,
            decode_method=cfg["decode_method"],
            allowed_chars=cfg["allowed_chars"],
        )
        results = pipe.process(pages)
        for i in range(2):
            inp = engine.prepare_input(
                ImageSource.from_tensor(pages[i][..., None], DimOrder.HWC)
            )
            assert results[i].text == engine.get_text(inp), cfg


def test_pipeline_tiled_detection_matches_plain_on_large_page():
    """Tiled pipeline detection on a page larger than the fake detector's
    input must find the same words (page-resolution postprocessing)."""
    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.parallel.pipeline import PagePipeline

    alphabet = DEFAULT_ALPHABET[:63]
    # Fake detector input is 200x100 (HxW, see fakes); pages are wider so
    # the width dimension tiles while the height pads.
    pages = np.zeros((2, 150, 300), dtype=np.float32)
    pages[0, 30:50, 20:90] = 1.0
    pages[0, 100:120, 150:260] = 1.0
    pages[1, 60:80, 40:140] = 1.0

    pipe = PagePipeline(
        FakeDetectionModel(),
        FakeRecognitionModel(),
        alphabet,
        max_lines_per_batch=8,
        tiled_detection=True,
        tile_overlap=32,
    )
    results = pipe.process(pages)
    assert len(results[0].words) == 2
    assert len(results[1].words) == 1
    # Word rects must be at page coordinates (inside their drawn regions).
    for rect in results[0].words:
        cx, cy = rect.center
        assert 0 <= cx <= 300 and 0 <= cy <= 150


@needs_devices
def test_recognition_train_step_sharded():
    import optax

    from ocrs_tpu.train.train import (
        init_recognition_state,
        make_mesh,
        make_recognition_train_step,
        shard_batch,
    )

    n = len(jax.devices())
    mp = 2 if n % 2 == 0 else 1
    mesh = make_mesh(model_parallel=mp)
    opt = optax.adam(1e-3)
    with mesh:
        state = init_recognition_state(mesh, opt, n_classes=12, hidden=32)
        step = make_recognition_train_step(mesh, opt)
        images = np.random.default_rng(0).normal(size=(n * 2, 1, 64, 32)).astype(np.float32)
        labels = np.ones((n * 2, 3), np.int32)
        lengths = np.full((n * 2,), 3, np.int32)
        images, labels, lengths = shard_batch(mesh, *map(np.asarray, (images, labels, lengths)))
        s1, loss1 = step(state, images, labels, lengths)
        s2, loss2 = step(s1, images, labels, lengths)
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        assert float(loss2) < float(loss1)  # one step of progress on a fixed batch
