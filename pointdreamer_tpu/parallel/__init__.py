from .mesh import make_mesh, shard_params_dp_tp, shard_views
