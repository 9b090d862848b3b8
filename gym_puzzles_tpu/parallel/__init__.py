from gym_puzzles_tpu.parallel.mesh import (
    DistributedPPO,
    make_mesh,
    init_distributed,
    train_state_specs,
)

__all__ = ["DistributedPPO", "make_mesh", "init_distributed", "train_state_specs"]
