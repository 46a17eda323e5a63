"""Live-simulator bridge (data/habitat_bridge.py): the reference's 5-process
VectorEnv fan-out (utils/custom_habitat_vector_env.py) as a bounded
producer pool, exercised end to end with the procedural panorama backend."""

import numpy as np
import pytest

from pixelsynth_tpu.data.habitat_bridge import (
    PanoramaGenerator,
    VectorGeneratorBridge,
)


def test_panorama_generator_protocol_fields():
    gen = PanoramaGenerator(W=32, max_rotation=30.0, num_worlds=2, seed=3)
    item = gen.sample_pair()
    assert item["input_img"].shape == (32, 32, 3)
    assert item["output_img"].shape == (32, 32, 3)
    assert item["depth_img"].shape == (32, 32)
    assert np.abs(item["input_img"]).max() <= 1.0
    for a, b in (("P_in", "Pinv_in"), ("P_out", "Pinv_out")):
        np.testing.assert_allclose(item[a] @ item[b], np.eye(4), atol=1e-4)
    # input and output views differ (second camera is rotation-jittered)
    assert np.abs(item["input_img"] - item["output_img"]).max() > 0.01


@pytest.mark.slow
def test_bridge_batches_and_closes():
    with VectorGeneratorBridge(
        PanoramaGenerator(W=32, max_rotation=30.0, num_worlds=2),
        num_workers=2, seed=11,
    ) as bridge:
        b = bridge.batch(4)
        assert b["input_img"].shape == (4, 32, 32, 3)
        assert b["P_in"].shape == (4, 4, 4)
        assert np.isfinite(b["input_img"]).all()
        # workers were seeded disjointly: the batch is not 4 copies
        assert np.abs(b["input_img"][0] - b["input_img"][1]).max() > 1e-3 or \
            np.abs(b["input_img"][0] - b["input_img"][2]).max() > 1e-3
    # after close, workers are gone
    assert all(not p.is_alive() for p in bridge._procs)


@pytest.mark.slow
def test_make_batch_source_habitat_live():
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.train.loop import make_batch_source

    cfg = Config()
    cfg.dataset = "habitat_live"
    cfg.train_data_path = "panorama"
    cfg.model.W = 32
    cfg.train.batch_size = 2
    fn = make_batch_source(cfg, "train")
    try:
        batch = fn()
        assert batch["input_img"].shape == (2, 32, 32, 3)
    finally:
        fn.bridge.close()
