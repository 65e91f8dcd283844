"""Console logging helpers (reference src/mjlab/utils/logging.py:6)."""

from __future__ import annotations


def print_info(msg: str) -> None:
    print(f"\033[1;32m[INFO]\033[0m {msg}")


def print_warning(msg: str) -> None:
    print(f"\033[1;33m[WARN]\033[0m {msg}")


def print_table(rows: list[tuple], headers: tuple, title: str = "") -> None:
    """Minimal fixed-width table for manager introspection dumps
    (replaces the reference's PrettyTable usage)."""
    cols = [headers] + [tuple(str(c) for c in r) for r in rows]
    widths = [max(len(r[i]) for r in cols) for i in range(len(headers))]
    if title:
        print(title)
    line = "+".join("-" * (w + 2) for w in widths)
    print(line)
    for r in cols:
        print(" | ".join(c.ljust(w) for c, w in zip(r, widths)))
        if r == headers:
            print(line)
    print(line)
