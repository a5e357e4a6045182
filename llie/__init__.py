"""Short alias for :mod:`low_light_image_enhancement_tpu`.

``import llie`` re-exports the full public API (SURVEY.md uses the short
name throughout).
"""

from low_light_image_enhancement_tpu import *  # noqa: F401,F403
from low_light_image_enhancement_tpu import (  # noqa: F401
    PRESETS,
    EnhancePipeline,
    PipelineConfig,
    __version__,
    enhance,
    enhance_batch,
)
from low_light_image_enhancement_tpu import (  # noqa: F401
    config,
    core,
    data,
    eval,
    http_server,
    io,
    kernels,
    models,
    ops,
    parallel,
    pipeline,
    serving,
    train,
    utils,
    video,
)
