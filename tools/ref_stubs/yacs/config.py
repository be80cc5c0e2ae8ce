"""Minimal yacs.config.CfgNode stand-in.

The reference only uses: CN(new_allowed=True), merge_from_file,
set_new_allowed, clone, nested attribute access, and free attribute
assignment (`common/myhand/config.py:1-21`,
`common/myhand/lijun_model_graph.py:39-51`).
"""

import copy

import yaml


class CfgNode(dict):
    def __init__(self, init_dict=None, new_allowed=False):
        super().__init__()
        for k, v in (init_dict or {}).items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgNode):
            return cls(v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def merge_from_file(self, path):
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        self._merge(data)

    def _merge(self, data):
        for k, v in data.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k]._merge(v)
            else:
                self[k] = self._wrap(v)

    def set_new_allowed(self, flag):  # behavioral no-op for the stub
        pass

    def clone(self):
        return copy.deepcopy(self)

    def dump(self):
        return yaml.safe_dump(self._to_dict())

    def _to_dict(self):
        return {k: (v._to_dict() if isinstance(v, CfgNode) else v)
                for k, v in self.items()}
