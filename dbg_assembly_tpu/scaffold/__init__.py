from . import index, map_pair, link  # noqa: F401
