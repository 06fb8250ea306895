from .bev import bev_enhanced_image, bev_ground_nonground_image, bev_height_image, save_png
from .visualization import Visualization
