from gen_fvgn_tpu.parallel.dp import (batch_sharding, make_mesh,
                                      replicate_sharding, shard_batch,
                                      shard_train_state)

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding", "shard_batch",
           "shard_train_state"]
