"""Mesh parallelism: pixel sharding, distributed init, sharded render/fit."""

from .mesh import (
    init_distributed, make_mesh, shard_image_rows,
    render_disk_image_sharded, fit_step_sharded,
)
