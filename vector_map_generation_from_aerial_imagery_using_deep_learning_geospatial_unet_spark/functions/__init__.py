from . import cellindex  # noqa: F401
