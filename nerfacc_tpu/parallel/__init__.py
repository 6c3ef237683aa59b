from .mesh import make_dp_prop_step, make_dp_train_step, make_mesh, shard_batch
from .tp import (
    make_mesh_2d,
    make_tp_field,
    make_tp_train_step,
    permute_w1,
    tp_w1_permutation,
)

__all__ = [
    "make_mesh",
    "make_dp_train_step",
    "make_dp_prop_step",
    "shard_batch",
    "make_mesh_2d",
    "make_tp_field",
    "make_tp_train_step",
    "permute_w1",
    "tp_w1_permutation",
]
