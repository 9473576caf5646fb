from .mesh import DATA_AXIS, is_master, make_mesh, shard_train_step

__all__ = ["DATA_AXIS", "make_mesh", "shard_train_step", "is_master"]
