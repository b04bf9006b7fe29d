"""mmcv/cnn/utils/weight_init.py shim (swin.py:12 imports trunc_normal_)."""
from .. import (  # noqa: F401
    constant_init,
    kaiming_init,
    normal_init,
    trunc_normal_,
    trunc_normal_init,
    xavier_init,
)
