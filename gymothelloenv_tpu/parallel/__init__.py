from gymothelloenv_tpu.parallel.sharding import (  # noqa: F401
    constrain_batch,
    constrain_batch_axes,
    constrain_replicated,
    make_mesh,
    place_replicated,
    policy_param_shardings,
    replicated,
    shard_batch_axes,
    shard_batch_tree,
)
from gymothelloenv_tpu.parallel.dp import make_sharded_train_step  # noqa: F401
from gymothelloenv_tpu.parallel.replay_shards import (  # noqa: F401
    global_size,
    sharded_sample,
    sharded_update_priorities,
)
