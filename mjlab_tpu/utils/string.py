"""Regex-based name resolution.

Behavioral equivalent of the reference's vendored Isaac Lab string utilities
(reference src/mjlab/utils/lab_api/string.py:178,274): resolve ordered
regex expressions against name lists, producing static index arrays that are
baked into jitted programs at startup.
"""

from __future__ import annotations

import re
from typing import Sequence


def resolve_matching_names(
    keys: str | Sequence[str],
    names: Sequence[str],
    preserve_order: bool = False,
) -> tuple[list[int], list[str]]:
    """Match regex key(s) against names.

    Returns (ids, matched_names). Default ordering follows ``names`` order;
    with preserve_order=True, follows the order of the keys.
    """
    if isinstance(keys, str):
        keys = [keys]
    compiled = [re.compile(k) for k in keys]

    ids: list[int] = []
    matched: list[str] = []
    used_keys = [False] * len(keys)
    if not preserve_order:
        for i, n in enumerate(names):
            for ki, c in enumerate(compiled):
                if c.fullmatch(n):
                    ids.append(i)
                    matched.append(n)
                    used_keys[ki] = True
                    break
    else:
        for ki, c in enumerate(compiled):
            for i, n in enumerate(names):
                if c.fullmatch(n) and i not in ids:
                    ids.append(i)
                    matched.append(n)
                    used_keys[ki] = True
    if not all(used_keys):
        unused = [k for k, u in zip(keys, used_keys) if not u]
        raise ValueError(
            f"No names matched for expressions {unused}; available: {list(names)}"
        )
    return ids, matched


def resolve_matching_names_values(
    data: dict[str, object],
    names: Sequence[str],
) -> tuple[list[int], list[str], list[object]]:
    """Resolve a dict of regex -> value against names.

    Each name may be matched by at most one key (error on conflicts).
    Returns (ids, matched_names, values) in ``names`` order.
    """
    ids: list[int] = []
    matched: list[str] = []
    values: list[object] = []
    used_keys = set()
    for i, n in enumerate(names):
        hit = None
        for k in data:
            if re.fullmatch(k, n):
                if hit is not None:
                    raise ValueError(
                        f"Name '{n}' matched by multiple expressions: '{hit}' and '{k}'"
                    )
                hit = k
        if hit is not None:
            ids.append(i)
            matched.append(n)
            values.append(data[hit])
            used_keys.add(hit)
    unused = set(data) - used_keys
    if unused:
        raise ValueError(
            f"No names matched for expressions {sorted(unused)}; available: {list(names)}"
        )
    return ids, matched, values


def resolve_expr(value: object, expr_map: dict[str, float], names: Sequence[str]):
    """Expand a scalar or regex-dict into a per-name list."""
    if isinstance(value, dict):
        ids, matched, vals = resolve_matching_names_values(value, names)
        if len(matched) != len(names):
            missing = set(names) - set(matched)
            raise ValueError(f"Unmatched names: {sorted(missing)}")
        out = [None] * len(names)
        for i, v in zip(ids, vals):
            out[i] = v
        return out
    return [value] * len(names)
