from . import mesh  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    train_loop_dp,
)
