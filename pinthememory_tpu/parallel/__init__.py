from pinthememory_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_train_step,
    batch_sharding,
    replicate_state,
)
