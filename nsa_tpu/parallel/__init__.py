from . import mesh, sharding, train_step  # noqa: F401
