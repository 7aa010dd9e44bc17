from hammlet_tpu.parallel.sharded import ShardedEngine, make_sharded_engine  # noqa: F401
from hammlet_tpu.parallel.mesh import position_mesh  # noqa: F401
