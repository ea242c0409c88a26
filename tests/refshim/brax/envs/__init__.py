from . import wrappers  # noqa: F401


def get_environment(env_name, backend="positional"):
    raise NotImplementedError(
        "refshim: the brax path is not backed in-image; use the "
        "mujoco_playground shim (PlaygroundVecGymnaxWrapper)"
    )
