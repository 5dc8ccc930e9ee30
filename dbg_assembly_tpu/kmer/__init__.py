from . import count  # noqa: F401
