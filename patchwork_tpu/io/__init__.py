from .bag import BagReader, decode_pointcloud2_cdr, encode_pointcloud2_cdr, sniff_format
from .kitti import iter_sequence, list_sequence, pad_to_capacity, read_bin
from .native import load_kitti_bin_padded, native_available, voxel_downsample_host
from .synthetic import demo_point_cloud, simulate_sequence, simulate_world, velodyne_like_cloud
