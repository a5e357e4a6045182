import threading

import numpy as np
import pytest

from low_light_image_enhancement_tpu.data.synth import synth_pair
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline
from low_light_image_enhancement_tpu.serving import EnhanceServer


def test_server_single_request_matches_pipeline():
    low, _ = synth_pair(0, 40, 64)
    with EnhanceServer(max_delay_ms=1.0) as srv:
        got = srv.enhance(low)
    want = EnhancePipeline(bucket=64).enhance(low)
    np.testing.assert_array_equal(got, want)


def test_server_micro_batches_mixed_shapes():
    imgs = [synth_pair(i, 30 + 7 * (i % 3), 50 + 11 * (i % 2))[0]
            for i in range(12)]
    with EnhanceServer(max_delay_ms=20.0, max_batch=8) as srv:
        futs = [srv.submit(im) for im in imgs]
        outs = [f.result(timeout=120) for f in futs]
    for im, out in zip(imgs, outs):
        assert out.shape == im.shape
        assert out.dtype == np.uint8


def test_server_concurrent_callers():
    lows = [synth_pair(i, 32, 48)[0] for i in range(8)]
    results = [None] * 8
    with EnhanceServer(max_delay_ms=10.0) as srv:
        def worker(i):
            results[i] = srv.enhance(lows[i])
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    ref = EnhancePipeline(bucket=64)
    for i in range(8):
        np.testing.assert_array_equal(results[i], ref.enhance(lows[i]))


def test_server_rejects_bad_shape_and_close_fails_pending():
    srv = EnhanceServer(max_delay_ms=1.0)
    with pytest.raises(ValueError):
        srv.submit(np.zeros((4, 4), np.uint8))
    srv.close()
    with pytest.raises(Exception):
        srv.enhance(synth_pair(0, 16, 16)[0])  # dispatcher stopped
