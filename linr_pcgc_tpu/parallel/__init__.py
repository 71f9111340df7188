from .mesh import make_mesh
from .train import (
    make_epoch_fn_dp,
    make_epoch_fn_sb_dp,
    make_epoch_fn_sb_sp,
    shard_gop,
    shard_sb_gop,
)
