from .mesh import make_mesh, make_mesh_gop_sp
from .train import (
    make_epoch_fn_dp,
    make_epoch_fn_sb_dp,
    make_epoch_fn_sb_sp,
    shard_gop,
    shard_sb_gop,
)
from .gop_parallel import (
    make_epoch_fn_gop_parallel,
    make_epoch_fn_gop_sp,
    overfit_gops_parallel,
    shard_gop_batches,
    stack_gop_state,
)
