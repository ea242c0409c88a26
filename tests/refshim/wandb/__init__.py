"""No-op wandb shim for running the reference scripts without a wandb
install; the parity tests run with WANDB_MODE=disabled so only the module
object itself (and inert log/init) are ever touched."""


class _Run:
    def __init__(self):
        self.config = {}

    def finish(self):
        pass


config = {}


def init(*args, **kwargs):
    return _Run()


def log(*args, **kwargs):
    pass


def login(*args, **kwargs):
    pass


def sweep(*args, **kwargs):
    return "sweep-0"


def agent(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass
