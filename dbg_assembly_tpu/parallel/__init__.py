from . import mesh, count_sharded  # noqa: F401
