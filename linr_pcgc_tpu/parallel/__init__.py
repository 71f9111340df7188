from .mesh import make_mesh
from .train import make_epoch_fn_dp, shard_gop
