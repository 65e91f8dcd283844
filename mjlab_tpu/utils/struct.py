"""Pytree dataclass helper.

``pytree`` registers a frozen dataclass as a JAX pytree. Fields annotated
with ``Static[...]`` (or declared via ``static_field()``) become aux data —
NOT traced — and may be plain Python values OR numpy arrays: aux data is
wrapped in a content-hashed container so jit caching works with array-valued
static fields (structural model tables such as joint types and geom pair
lists stay as numpy for host-side trace-time indexing).
"""

from __future__ import annotations

import dataclasses
from typing import Annotated, TypeVar, get_args, get_origin, get_type_hints

import jax
import numpy as np

_T = TypeVar("_T")


class _StaticMarker:
    pass


class _StaticAlias:
    def __getitem__(self, item):
        return Annotated[item, _StaticMarker]


Static = _StaticAlias()


def static_field(**kwargs):
    """Declare a dataclass field as static (pytree aux data)."""
    md = dict(kwargs.pop("metadata", {}) or {})
    md["static"] = True
    return dataclasses.field(metadata=md, **kwargs)


def _is_static(f: dataclasses.Field, hints) -> bool:
    if f.metadata.get("static", False):
        return True
    ann = hints.get(f.name, f.type)
    return get_origin(ann) is Annotated and _StaticMarker in get_args(ann)


def _freeze(v):
    """Hashable content token for a static value (recursive)."""
    if isinstance(v, np.ndarray):
        return ("__np__", v.shape, v.dtype.str, v.tobytes())
    if isinstance(v, (list, tuple)):
        return (type(v).__name__,) + tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return ("__dict__",) + tuple(
            (k, _freeze(v[k])) for k in sorted(v)
        )
    return v


class _Aux:
    """Hashable wrapper around static field values (supports numpy)."""

    __slots__ = ("values", "_token", "_hash")

    def __init__(self, values: tuple):
        self.values = values
        self._token = None
        self._hash = None

    def token(self):
        if self._token is None:
            self._token = tuple(_freeze(v) for v in self.values)
        return self._token

    def __hash__(self):
        if self._hash is None:
            self._hash = hash(self.token())
        return self._hash

    def __eq__(self, other):
        return isinstance(other, _Aux) and self.token() == other.token()


def pytree(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a pytree node.

    Static fields (see ``Static``/``static_field``) go to aux data with
    content-based hashing; all other fields are pytree children.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    try:
        hints = get_type_hints(cls, include_extras=True)
    except Exception:
        hints = {}
    data_fields, meta_fields = [], []
    for f in dataclasses.fields(cls):
        (meta_fields if _is_static(f, hints) else data_fields).append(f.name)
    data_fields = tuple(data_fields)
    meta_fields = tuple(meta_fields)

    def _aux_of(obj):
        # memoize the aux wrapper PER INSTANCE: every tree_flatten
        # otherwise builds a fresh _Aux whose content hash re-runs
        # tobytes over all static numpy tables (mesh data, contact pair
        # tables, host_consts) — measured ~10 ms of HOST time per jitted
        # dispatch of an env step at G1 scale (round-4 env trace).
        # Static fields are immutable by contract (frozen dataclass,
        # host-built tables), so identity-cached hashing is sound;
        # replace() creates a new instance and thus a fresh cache.
        aux = obj.__dict__.get("_aux_cache")
        if aux is None:
            aux = _Aux(tuple(getattr(obj, n) for n in meta_fields))
            object.__setattr__(obj, "_aux_cache", aux)
        return aux

    def flatten_with_keys(obj):
        children = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_fields
        )
        return children, _aux_of(obj)

    def flatten(obj):
        children = tuple(getattr(obj, n) for n in data_fields)
        return children, _aux_of(obj)

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for n, v in zip(data_fields, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(meta_fields, aux.values):
            object.__setattr__(obj, n, v)
        # reuse the SAME _Aux (with its memoized hash) on the round-trip
        object.__setattr__(obj, "_aux_cache", aux)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
