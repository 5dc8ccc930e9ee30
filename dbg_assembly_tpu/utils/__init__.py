from . import nstat  # noqa: F401
