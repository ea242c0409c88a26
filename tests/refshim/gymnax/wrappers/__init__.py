from . import purerl  # noqa: F401
