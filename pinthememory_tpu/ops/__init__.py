from pinthememory_tpu.ops.resize import (  # noqa: F401
    resize_bilinear_align_corners,
    resize_nearest,
    upsample,
)
from pinthememory_tpu.ops.pool import global_avg_pool, max_pool_3x3_s2, max_pool_3x3_s2_ceil  # noqa: F401
