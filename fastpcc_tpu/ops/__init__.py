from .morton import (
    morton_encode, morton_decode, morton_encode_xyz, sort_points_by_code,
)
from .sparse import (
    VoxelGrid, INVALID_CODE, pad_to, downsample_with_bins, build_neighbor_table,
    children_codes, octant_symbols, symbols_to_bins, expand_children,
    ancestor_gather_dense,
)
