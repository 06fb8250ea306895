from .checkpoint import load_masks, load_odometry, save_masks, save_odometry
from .debug import assert_finite, debug_nans
from .metrics import format_metrics, mask_metrics
