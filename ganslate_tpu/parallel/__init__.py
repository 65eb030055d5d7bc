from ganslate_tpu.parallel.mesh import (batch_sharding, get_mesh, make_mesh,  # noqa: F401
                                        replicate_to_mesh, replicated_sharding,
                                        set_mesh, shard_batch)
