from multimodal_baby_tpu.parallel.mesh import (
    create_mesh, batch_sharding, replicated, shard_batch,
    make_param_shardings, batch_spec,
)
