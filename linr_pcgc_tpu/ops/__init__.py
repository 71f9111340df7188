from .coords import (
    COORD_BITS,
    KEY_PAD,
    coord_key,
    key_to_coord,
    canonical_sort,
    sort_rows_by_key,
    unique_sorted,
    lookup,
    membership,
)
from .octree import (
    OCTANT_OFFSETS,
    NEIGHBOR_OFFSETS_7,
    CONV_OFFSETS_27,
    conv_offsets,
    octree_down,
    octree_up,
    neighbor_feature_code,
    neighbor_map,
    neighbor_map_27,
)
