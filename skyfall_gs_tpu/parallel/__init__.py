from skyfall_gs_tpu.parallel.mesh import make_mesh
from skyfall_gs_tpu.parallel.sharding import (
    make_parallel_train_step,
    make_parallel_render,
)

__all__ = ["make_mesh", "make_parallel_train_step", "make_parallel_render"]
