"""YAML config system preserving the reference schema verbatim.

Semantics mirror the reference loader (``utils/yaml_utils.py:8-22`` in
nogu-atsu/RGBD-GAN): a run is configured by a single YAML file; attribute
access on a *missing* key returns ``None`` (many defaults live at use sites
via ``config.x if config.x else default``); item access raises ``KeyError``;
``repr`` dumps the YAML. ``stage_interval`` stays a comma string and
``dynamic_batch_size`` a comma string, exactly as the reference yml schema
expects.
"""

from __future__ import annotations

from typing import Any, Mapping

import yaml


class Config:
    """Attr-dict over a YAML mapping; missing attributes resolve to ``None``."""

    def __init__(self, config_dict: Mapping[str, Any]):
        # Use object.__setattr__ so __getattr__ never recurses before
        # ``config`` exists (e.g. during copy/pickle).
        object.__setattr__(self, "config", dict(config_dict))

    def __getattr__(self, key: str) -> Any:
        config = self.__dict__.get("config")
        if config is not None and key in config:
            return config[key]
        return None

    def __setattr__(self, key: str, value: Any) -> None:
        # The reference mutates config (e.g. ``config.gpu = args.gpu``,
        # ``config.iteration = 10`` under profiling); route writes into the
        # underlying dict so they round-trip through repr/serialisation.
        self.config[key] = value

    def __getitem__(self, key: str) -> Any:
        return self.config[key]

    def __contains__(self, key: str) -> bool:
        return key in self.config

    def to_dict(self) -> dict:
        return dict(self.config)

    def __repr__(self) -> str:
        return yaml.dump(self.config, default_flow_style=False)


def load_config(path: str) -> Config:
    """Load a run config yml (same schema as the reference ``configs/*.yml``)."""
    with open(path) as f:
        return Config(yaml.safe_load(f))


class StrictConfig(Config):
    """Variant that raises ``AttributeError`` on missing keys — the twin of
    the second loader in the reference (``source/yaml_utils.py:14-28``)."""

    def __getattr__(self, key: str) -> Any:
        config = self.__dict__.get("config")
        if config is not None and key in config:
            return config[key]
        raise AttributeError(key)


def load_module(fn: str, name: str):
    """Dynamic module loader (``source/yaml_utils.py:37-41``): import
    attribute ``name`` from python file ``fn``."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        __import__("os").path.splitext(__import__("os").path.basename(fn))[0], fn
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, name)


def load_model(model_fn: str, model_name: str, args=None):
    """Config-driven model factory (``source/yaml_utils.py:44-48``)."""
    model = load_module(model_fn, model_name)
    return model(**args) if args else model()


def load_dataset(config):
    """Config-driven dataset factory (``source/yaml_utils.py:31-34``)."""
    dataset = load_module(config.dataset["dataset_fn"], config.dataset["dataset_name"])
    return dataset(**config.dataset["args"])


def load_updater_class(config):
    """Config-driven updater lookup (``source/yaml_utils.py:54-55``)."""
    return load_module(config.updater["fn"], config.updater["name"])
