from .mesh import make_mesh, sharded_sketch_count_step, sharded_dp_level_step
