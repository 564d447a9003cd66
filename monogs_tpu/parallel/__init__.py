from .gauss import (  # noqa: F401
    gp_adam_map_step,
    gp_map_loss_grad,
    gp_render_tiles,
    gp_tile_rows,
    make_gauss_mesh,
    shard_gauss,
)
from .mesh import make_mesh, sharded_map_step  # noqa: F401
