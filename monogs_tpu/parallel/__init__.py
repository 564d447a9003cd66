from .mesh import make_mesh, sharded_map_step  # noqa: F401
