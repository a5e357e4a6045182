"""Learned models: Zero-DCE-style curve estimator and Retinex decomposition.

Pure functional style (``init_*`` -> param pytree, ``apply_*``): zero
framework magic, trivially shardable with pjit/NamedSharding.
"""

from low_light_image_enhancement_tpu.models.curve_cnn import (
    CurveEstimatorCNN,
    init_curve_cnn,
    apply_curve_cnn,
)
from low_light_image_enhancement_tpu.models.decom import (
    DecomNet,
    init_decom_net,
    apply_decom_net,
)
from low_light_image_enhancement_tpu.models.fcn import (
    EnhanceFCN,
    init_fcn,
    apply_fcn,
)

__all__ = [
    "CurveEstimatorCNN",
    "init_curve_cnn",
    "apply_curve_cnn",
    "DecomNet",
    "init_decom_net",
    "apply_decom_net",
    "EnhanceFCN",
    "init_fcn",
    "apply_fcn",
]
