"""OmegaConf import shim (the parity tests pass plain dicts, so only the
symbols referenced at the reference scripts' module/f-unction scope exist)."""

import yaml


class OmegaConf:
    @staticmethod
    def to_container(cfg, **kwargs):
        return cfg

    @staticmethod
    def to_yaml(cfg):
        return yaml.safe_dump(cfg)

    @staticmethod
    def save(cfg, path):
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)

    @staticmethod
    def load(path):
        with open(path) as f:
            return yaml.safe_load(f)
