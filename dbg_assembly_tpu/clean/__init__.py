from . import lowqual, adapter  # noqa: F401
