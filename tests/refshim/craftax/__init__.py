from . import craftax_env  # noqa: F401
