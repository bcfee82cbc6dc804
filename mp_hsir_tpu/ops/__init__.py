from mp_hsir_tpu.ops.basic import (  # noqa: F401
    gelu_exact,
    layer_norm,
    layer_norm_biasfree,
    pixel_shuffle,
    pixel_unshuffle,
)
from mp_hsir_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    shifted_window_mask,
    roll_hw,
)
from mp_hsir_tpu.ops.conv import conv2d, depthwise_conv2d  # noqa: F401
from mp_hsir_tpu.ops.resize import (  # noqa: F401
    resize_bicubic,
    resize_bilinear,
    resize_nearest,
    pixel_replicate_upsample,
)
