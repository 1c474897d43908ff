from .mesh import make_mesh, best_mesh_shape  # noqa: F401
from .sharding import unet_param_sharding, shard_params, data_sharding  # noqa: F401
