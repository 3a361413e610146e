"""Minimal omegaconf stand-in for importing the reference's modules offline.

DictConfig supports attribute access (the reference reads
``first_stage_config.params.ddconfig.ch_mult`` and
``config.params.get(...)``); OmegaConf.create wraps nested dicts/lists.
"""


class ListConfig(list):
    pass


class DictConfig(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _wrap(x):
    if isinstance(x, DictConfig) or isinstance(x, ListConfig):
        return x
    if isinstance(x, dict):
        return DictConfig({k: _wrap(v) for k, v in x.items()})
    if isinstance(x, (list, tuple)):
        return ListConfig([_wrap(v) for v in x])
    return x


class OmegaConf:
    @staticmethod
    def create(obj=None):
        return _wrap(obj if obj is not None else {})

    @staticmethod
    def to_container(cfg, resolve=False):
        def unwrap(x):
            if isinstance(x, dict):
                return {k: unwrap(v) for k, v in x.items()}
            if isinstance(x, list):
                return [unwrap(v) for v in x]
            return x
        return unwrap(cfg)
