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
