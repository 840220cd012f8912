from .attention import attention, attention_reference  # noqa: F401
from .groupnorm import group_norm, group_norm_reference  # noqa: F401
from .abn import FusedABNorm, fused_abn, fused_abn_train, mean_var, edz_eydz, invert_activation  # noqa: F401
from .morphology import dilate, erode, morphology2d  # noqa: F401
from .resize import (  # noqa: F401
    imagenet_normalize,
    resize_bilinear,
    resize_mask_hard,
    resize_nearest,
    to_symmetric_range,
    to_unit_range,
)
from .morphology import Dilation2D, Erosion2D, Morphology2D  # noqa: F401
