from . import wrapper  # noqa: F401
