"""Name-only stubs (imported, never used, by the playground path)."""


class EpisodeWrapper:
    def __init__(self, *a, **k):
        raise NotImplementedError("refshim: brax path not backed in-image")


class AutoResetWrapper(EpisodeWrapper):
    pass
