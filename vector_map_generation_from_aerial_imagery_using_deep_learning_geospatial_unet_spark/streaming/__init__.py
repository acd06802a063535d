from . import manifest  # noqa: F401
