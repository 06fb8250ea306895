from .binning import PatchAssignment, assign_patches, ring_edges, sector_edges
from .engine import filter_ground, make_filter_ground, make_filter_ground_batched
from .segops import SegOps, default_impl, sort_by_segment
