import numpy as np

from low_light_image_enhancement_tpu.data.synth import synth_batch, synth_pair
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def test_enhance_stream_single_frames_ordered():
    pipe = EnhancePipeline()
    frames = [synth_pair(i, 32, 48)[0] for i in range(6)]
    outs = list(pipe.enhance_stream(iter(frames)))
    assert len(outs) == 6
    for f, o in zip(frames, outs):
        np.testing.assert_array_equal(o, pipe.enhance(f))


def test_enhance_stream_batches():
    pipe = EnhancePipeline()
    batches = [synth_batch(2, 32, 48, start=i * 2)[0] for i in range(3)]
    outs = list(pipe.enhance_stream(iter(batches)))
    assert len(outs) == 3
    assert all(o.shape == (2, 32, 48, 3) for o in outs)
    np.testing.assert_array_equal(outs[0], pipe.enhance_batch(batches[0]))
