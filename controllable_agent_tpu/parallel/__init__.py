from .mesh import (make_mesh, replicate_spec, batch_spec, shard_batch,
                   make_dp_trainer, make_dp_offline_trainer)
