"""Python-dict config system with ``_base_`` inheritance and CLI deep-merge.

Functional parity with mmcv's ``Config.fromfile`` as used by the reference
(``/root/reference/tools/train.py:89-95``): configs are executable Python files
whose module-level names become the config dict; a ``_base_`` entry (str or
list) pulls in parent configs which are deep-merged (child wins); a dict value
containing ``_delete_: True`` replaces rather than merges the base value;
``merge_from_dict`` implements ``--cfg-options a.b.c=val`` CLI overrides.

This is a fresh implementation (no mmcv), kept deliberately small.
"""

from __future__ import annotations

import ast
import copy
import os
import os.path as osp
import sys
import types
from typing import Any

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"
RESERVED_KEYS = ("filename", "text")


class ConfigDict(dict):
    """A dict with attribute access; missing attribute raises AttributeError."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(
                f"'ConfigDict' object has no attribute '{name}'"
            ) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        out = ConfigDict()
        memo[id(self)] = out
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in value.items()})
        if isinstance(value, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in value.items()})
        if isinstance(value, (list, tuple)):
            wrapped = [ConfigDict._wrap(v) for v in value]
            return type(value)(wrapped) if isinstance(value, tuple) else wrapped
        return value


def _load_py_file(filename: str) -> dict:
    """Execute a python config file and return its module-level dict."""
    filename = osp.abspath(osp.expanduser(filename))
    if not osp.isfile(filename):
        raise FileNotFoundError(f"config file not found: {filename}")
    with open(filename, encoding="utf-8") as f:
        content = f.read()
    # Validate syntax with a clear error before exec.
    try:
        ast.parse(content)
    except SyntaxError as e:
        raise SyntaxError(f"error parsing config {filename}: {e}") from e
    mod = types.ModuleType("_dsl_tpu_cfg")
    mod.__file__ = filename
    old_path = list(sys.path)
    sys.path.insert(0, osp.dirname(filename))
    try:
        exec(compile(content, filename, "exec"), mod.__dict__)
    finally:
        sys.path[:] = old_path
    return {
        k: v
        for k, v in mod.__dict__.items()
        if not k.startswith("__") and not isinstance(v, types.ModuleType)
        and not isinstance(v, types.FunctionType)
    }


def _merge_a_into_b(a: dict, b: dict) -> dict:
    """Deep-merge dict ``a`` (child) into ``b`` (base); child wins.

    A child dict with ``_delete_: True`` replaces the base value outright
    (mmcv semantics).
    """
    b = copy.deepcopy(b)
    for k, v in a.items():
        if isinstance(v, dict) and k in b and isinstance(b[k], dict):
            if v.pop(DELETE_KEY, False):
                b[k] = copy.deepcopy(v)
            else:
                b[k] = _merge_a_into_b(v, b[k])
        else:
            if isinstance(v, dict):
                v = {kk: vv for kk, vv in v.items() if kk != DELETE_KEY}
            b[k] = copy.deepcopy(v)
    return b


class Config:
    """Resolved config with dot access, ``_base_`` inheritance, and dump."""

    def __init__(self, cfg_dict: dict | None = None, filename: str | None = None,
                 text: str = ""):
        cfg_dict = cfg_dict or {}
        for key in cfg_dict:
            if key in RESERVED_KEYS:
                raise KeyError(f"{key} is reserved for Config")
        object.__setattr__(self, "_cfg_dict", ConfigDict._wrap(cfg_dict))
        object.__setattr__(self, "_filename", filename)
        object.__setattr__(self, "_text", text)

    # -- construction ------------------------------------------------------
    @staticmethod
    def fromfile(filename: str) -> "Config":
        cfg_dict = Config._file2dict(filename)
        with open(filename, encoding="utf-8") as f:
            text = f.read()
        return Config(cfg_dict, filename=filename, text=text)

    @staticmethod
    def _file2dict(filename: str) -> dict:
        cfg_dict = _load_py_file(filename)
        base = cfg_dict.pop(BASE_KEY, None)
        if base is None:
            return cfg_dict
        if isinstance(base, str):
            base = [base]
        cfg_dir = osp.dirname(osp.abspath(osp.expanduser(filename)))
        merged: dict = {}
        for b in base:
            parent = Config._file2dict(osp.join(cfg_dir, b))
            dup = set(merged) & set(parent)
            if dup:
                raise KeyError(f"duplicate keys {dup} in multiple _base_ files")
            merged.update(parent)
        return _merge_a_into_b(cfg_dict, merged)

    @staticmethod
    def fromstring(cfg_str: str, filename: str = "<string>") -> "Config":
        mod: dict = {}
        exec(compile(cfg_str, filename, "exec"), mod)
        cfg_dict = {
            k: v for k, v in mod.items()
            if not k.startswith("__") and not isinstance(v, types.ModuleType)
        }
        return Config(cfg_dict, filename=None, text=cfg_str)

    # -- access ------------------------------------------------------------
    @property
    def filename(self) -> str | None:
        return self._filename

    @property
    def text(self) -> str:
        return self._text

    def __getattr__(self, name: str) -> Any:
        return getattr(self._cfg_dict, name)

    def __setattr__(self, name: str, value: Any) -> None:
        self._cfg_dict[name] = ConfigDict._wrap(value)

    def __getitem__(self, name: str) -> Any:
        return self._cfg_dict[name]

    def __setitem__(self, name: str, value: Any) -> None:
        self._cfg_dict[name] = ConfigDict._wrap(value)

    def __contains__(self, name: str) -> bool:
        return name in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def __len__(self) -> int:
        return len(self._cfg_dict)

    def get(self, name: str, default: Any = None) -> Any:
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()

    def items(self):
        return self._cfg_dict.items()

    def to_dict(self) -> dict:
        return _unwrap(self._cfg_dict)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()), filename=self._filename,
                      text=self._text)

    # -- mutation ----------------------------------------------------------
    def merge_from_dict(self, options: dict) -> None:
        """Merge ``{"a.b.c": v}``-style flat options into the config.

        Parity with mmcv ``Config.merge_from_dict`` / ``--cfg-options``
        (``/root/reference/tools/train.py:55-64``).
        """
        nested: dict = {}
        for full_key, v in options.items():
            d = nested
            parts = full_key.split(".")
            for k in parts[:-1]:
                d = d.setdefault(k, {})
            d[parts[-1]] = v
        merged = _merge_a_into_b(nested, self.to_dict())
        object.__setattr__(self, "_cfg_dict", ConfigDict._wrap(merged))

    # -- dump --------------------------------------------------------------
    def dump(self, file: str | None = None) -> str | None:
        text = _format_dict(self.to_dict())
        if file is None:
            return text
        os.makedirs(osp.dirname(osp.abspath(file)), exist_ok=True)
        with open(file, "w", encoding="utf-8") as f:
            f.write(text)
        return None

    @property
    def pretty_text(self) -> str:
        return _format_dict(self.to_dict())

    def __repr__(self) -> str:
        return f"Config (path: {self._filename}): {self.to_dict()!r}"


def _unwrap(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        out = [_unwrap(v) for v in value]
        return tuple(out) if isinstance(value, tuple) else out
    return value


def _format_dict(d: dict, indent: int = 0) -> str:
    pad = " " * indent
    lines = []
    for k, v in d.items():
        if isinstance(v, dict):
            lines.append(f"{pad}{k} = dict(")
            lines.append(_format_inner(v, indent + 4))
            lines.append(f"{pad})")
        else:
            lines.append(f"{pad}{k} = {v!r}")
    return "\n".join(lines) + "\n"


def _format_inner(d: dict, indent: int) -> str:
    pad = " " * indent
    lines = []
    for k, v in d.items():
        if isinstance(v, dict):
            lines.append(f"{pad}{k}=dict(")
            lines.append(_format_inner(v, indent + 4))
            lines.append(f"{pad}),")
        else:
            lines.append(f"{pad}{k}={v!r},")
    return "\n".join(lines)


def parse_cfg_option(value: str) -> Any:
    """Parse a ``--cfg-options`` string value into a python object."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        if value.lower() in ("true", "false"):
            return value.lower() == "true"
        if value.lower() in ("none", "null"):
            return None
        return value


class DictAction:
    """argparse action-like helper: ``KEY=VAL`` pairs to a dict.

    Use as ``action=DictAction`` with argparse (mirrors mmcv's DictAction).
    """

    def __init__(self, option_strings, dest, **kwargs):
        self.option_strings = option_strings
        self.dest = dest
        self.nargs = "+"
        self.const = None
        self.default = kwargs.get("default")
        self.type = None
        self.choices = None
        self.required = kwargs.get("required", False)
        self.help = kwargs.get("help")
        self.metavar = kwargs.get("metavar")

    def __call__(self, parser, namespace, values, option_string=None):
        options = getattr(namespace, self.dest, None) or {}
        for kv in values:
            key, _, val = kv.partition("=")
            options[key] = parse_cfg_option(val)
        setattr(namespace, self.dest, options)

    def format_usage(self):
        return "|".join(self.option_strings)
