from .mesh import make_mesh
from .dp import make_dp_train_step, replicate, shard_batch
