"""Shared parsing for stringly-typed plan options.

``plans.config._str_options`` stringifies every YAML option value, so a
transformer that coerces with ``bool(opts.get(...))`` sees ``'false'``
as truthy and the option can never be disabled (ADVICE r8, medium).
All boolean options must go through :func:`parse_bool`.
"""

from __future__ import annotations

from typing import Any

_TRUE = {"true", "1", "yes", "on"}
_FALSE = {"false", "0", "no", "off", ""}


def parse_bool(value: Any, default: bool = False) -> bool:
    """Parse a YAML/plan option value into a bool.

    ``None`` (option absent) returns *default*; real bools pass
    through; strings are matched case-insensitively against the usual
    YAML spellings. Unrecognized strings raise so a typo'd option
    (``includeCurrent: flase``) fails loudly instead of silently
    picking a side.
    """
    if value is None:
        return default
    if isinstance(value, bool):
        return value
    s = str(value).strip().lower()
    if s in _TRUE:
        return True
    if s in _FALSE:
        return False
    raise ValueError(f"not a boolean option value: {value!r}")
