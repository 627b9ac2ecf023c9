"""Dataclass-based config system with YAML-include inheritance and dotlist CLI.

Reproduces the public UX of the reference's ``lib/simple_config.py``
(reference: lib/simple_config.py:39-326):
  * dataclass fields with strict recursive type checking,
  * ``merge_with_yaml`` supporting ``# include "path.yaml"`` header inheritance,
  * ``merge_with_dotlist`` for ``a.b.c=value`` CLI overrides,
  * auto-import: assigning ``X_module_path = 'pkg.mod'`` replaces the sibling
    field ``X`` with ``importlib.import_module('pkg.mod').Config()``
    (reference: lib/simple_config.py:100-120),
  * ``to_yaml`` round-trip.

Implementation is original; only the user-facing behavior matches.
"""
import dataclasses
import importlib
import os.path as osp
import re
import typing
from typing import Any, Dict, List, Tuple, Union

import yaml

_MODULE_PATH_SUFFIX = '_module_path'
_INCLUDE_RE = re.compile(r'^#\s*include\s+"(.*?)"\s*$')


def _is_config(obj) -> bool:
    return isinstance(obj, SimpleConfig)


def _type_matches(value, annot) -> bool:
    """Best-effort structural type check for the annotation grammar we use:
    scalars, Optional, List/Tuple/Dict of scalars, Union."""
    origin = typing.get_origin(annot)
    args = typing.get_args(annot)
    if annot is Any:
        return True
    if origin is None:
        if annot is float:
            return isinstance(value, (int, float)) and not isinstance(value, bool)
        if annot is int:
            return isinstance(value, int) and not isinstance(value, bool)
        if isinstance(annot, type):
            return isinstance(value, annot)
        return True
    if origin is Union:
        return any(_type_matches(value, a) for a in args)
    if origin in (list, List):
        return isinstance(value, list) and all(_type_matches(v, args[0]) for v in value) \
            if args else isinstance(value, list)
    if origin in (tuple, Tuple):
        if not isinstance(value, (tuple, list)):
            return False
        if len(args) == 2 and args[1] is Ellipsis:
            return all(_type_matches(v, args[0]) for v in value)
        return len(value) == len(args) and all(_type_matches(v, a) for v, a in zip(value, args))
    if origin in (dict, Dict):
        return isinstance(value, dict)
    return True


def _coerce(value, annot):
    """Coerce parsed YAML/CLI scalars into the annotated container type."""
    origin = typing.get_origin(annot)
    args = typing.get_args(annot)
    if origin is Union:
        for a in args:
            if a is type(None) and value is None:
                return None
        for a in args:
            try:
                c = _coerce(value, a)
                if _type_matches(c, a):
                    return c
            except (TypeError, ValueError):
                continue
        return value
    if origin in (tuple, Tuple) and isinstance(value, (list, tuple)):
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_coerce(v, args[0]) for v in value)
        if args:
            return tuple(_coerce(v, a) for v, a in zip(value, args))
        return tuple(value)
    if origin in (list, List) and isinstance(value, (list, tuple)):
        return [_coerce(v, args[0]) for v in value] if args else list(value)
    if annot is float and isinstance(value, int) and not isinstance(value, bool):
        return float(value)
    return value


def _parse_cli_scalar(text: str):
    """Parse one dotlist value: YAML-style scalars, plus (a,b) tuples and
    [a,b] lists (reference: lib/simple_config.py:223-263)."""
    text = text.strip()
    if text.startswith('(') and text.endswith(')'):
        inner = text[1:-1].strip()
        if not inner:
            return ()
        return tuple(_parse_cli_scalar(t) for t in _split_top_level(inner))
    if text.startswith('[') and text.endswith(']'):
        inner = text[1:-1].strip()
        if not inner:
            return []
        return [_parse_cli_scalar(t) for t in _split_top_level(inner)]
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _split_top_level(text: str) -> List[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch in '([':
            depth += 1
        elif ch in ')]':
            depth -= 1
        if ch == ',' and depth == 0:
            parts.append(''.join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append(''.join(cur))
    return [p.strip() for p in parts]


@dataclasses.dataclass
class SimpleConfig:
    def check(self):
        """Recursive type + value check. Subclasses override
        ``check_local_value`` for custom invariants."""
        for f in dataclasses.fields(self):
            value = getattr(self, f.name)
            if _is_config(value):
                value.check()
            elif value is None and (self._hint(f.name) is SimpleConfig
                                    or isinstance(self._hint(f.name), type)
                                    and issubclass(self._hint(f.name), SimpleConfig)):
                pass  # un-imported sub-config slot (filled by *_module_path)
            else:
                coerced = _coerce(value, self._hint(f.name))
                setattr(self, f.name, coerced)
                if not _type_matches(coerced, self._hint(f.name)):
                    raise TypeError(
                        f'{type(self).__name__}.{f.name} = {coerced!r} does not match '
                        f'annotation {self._hint(f.name)}')
        self.check_local_value()
        return self

    def check_local_value(self):
        pass

    @classmethod
    def _hints(cls) -> Dict[str, Any]:
        if '_hints_cache' not in cls.__dict__:
            cls._hints_cache = typing.get_type_hints(cls)
        return cls._hints_cache

    def _hint(self, name):
        return type(self)._hints().get(name, Any)

    # ---------------- merging ----------------

    def merge_with_dict(self, d: Dict[str, Any]):
        names = {f.name for f in dataclasses.fields(self)}
        # Process *_module_path keys first so auto-imported sub-configs exist
        # before their fields are merged (reference: lib/simple_config.py:100-120).
        keys = sorted(d.keys(), key=lambda k: not k.endswith(_MODULE_PATH_SUFFIX))
        for key in keys:
            value = d[key]
            if key not in names:
                raise KeyError(f'Unknown config key {key!r} for {type(self).__name__}')
            if key.endswith(_MODULE_PATH_SUFFIX):
                self._auto_import(key, value)
                continue
            cur = getattr(self, key)
            if _is_config(cur):
                if not isinstance(value, dict):
                    raise TypeError(f'{key} expects a mapping, got {value!r}')
                cur.merge_with_dict(value)
            else:
                setattr(self, key, _coerce(value, self._hint(key)))
        return self

    def _auto_import(self, key: str, module_path: str):
        setattr(self, key, module_path)
        target = key[: -len(_MODULE_PATH_SUFFIX)]
        names = {f.name for f in dataclasses.fields(self)}
        if target in names:
            mod = importlib.import_module(module_path)
            cur = getattr(self, target, None)
            new = mod.Config()
            if _is_config(cur) and type(cur) is type(new):
                return  # same config class already in place; keep merged values
            setattr(self, target, new)

    def merge_with_dotdict(self, dotdict: Dict[str, Any]):
        nested: Dict[str, Any] = {}
        # module-path keys first for the same reason as merge_with_dict
        for key in sorted(dotdict.keys(), key=lambda k: not k.endswith(_MODULE_PATH_SUFFIX)):
            parts = key.split('.')
            node = nested
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = dotdict[key]
            if key.endswith(_MODULE_PATH_SUFFIX):
                # apply incrementally so later keys can land in the new sub-config
                self.merge_with_dict(nested)
                nested = {}
        if nested:
            self.merge_with_dict(nested)
        return self

    def merge_with_dotlist(self, dotlist: List[str]):
        dotdict = {}
        for item in dotlist:
            if '=' not in item:
                raise ValueError(f'Expected key=value, got {item!r}')
            key, _, raw = item.partition('=')
            dotdict[key.strip()] = _parse_cli_scalar(raw)
        return self.merge_with_dotdict(dotdict)

    def merge_with_yaml(self, yaml_path: str):
        """Load a YAML file; a leading ``# include "other.yaml"`` line merges
        the included file first (relative to CWD, matching the reference's
        repo-root-relative convention; falls back to the including file's dir)."""
        with open(yaml_path) as f:
            text = f.read()
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            m = _INCLUDE_RE.match(line)
            if m:
                inc = m.group(1)
                if not osp.isfile(inc):
                    # repo-root-relative include, resolved by walking up from
                    # the including file (so configs work from any CWD)
                    d = osp.dirname(osp.abspath(yaml_path))
                    cands = [osp.join(d, inc), osp.join(d, osp.basename(inc))]
                    while True:
                        parent = osp.dirname(d)
                        if parent == d:
                            break
                        d = parent
                        cands.append(osp.join(d, inc))
                    for cand in cands:
                        if osp.isfile(cand):
                            inc = cand
                            break
                self.merge_with_yaml(inc)
            elif not line.startswith('#'):
                break
        data = yaml.safe_load(text)
        if data:
            self.merge_with_dict(data)
        return self

    # ---------------- dumping ----------------

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if _is_config(v):
                out[f.name] = v.to_dict()
            elif isinstance(v, tuple):
                out[f.name] = list(v)
            else:
                out[f.name] = v
        return out

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)
