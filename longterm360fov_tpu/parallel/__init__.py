from . import mesh, multihost, pp, sp, tp  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    train_loop_dp,
)
from .pp import make_pp_mesh, pp_apply_fn, pp_decode  # noqa: F401
from .sp import (  # noqa: F401
    make_sp_mesh,
    ring_self_attention,
    sp_apply_fn,
    sp_decode,
)
from .tp import apply_tp_shardings, tp_param_shardings  # noqa: F401
