from gymothelloenv_tpu.parallel.sharding import (  # noqa: F401
    constrain_batch,
    make_mesh,
    policy_param_shardings,
    replicated,
    shard_batch_tree,
)
from gymothelloenv_tpu.parallel.dp import make_sharded_train_step  # noqa: F401
