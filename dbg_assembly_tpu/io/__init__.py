from . import fastq, lib, cz, stat  # noqa: F401
