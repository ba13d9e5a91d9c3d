"""Runtime options (reference: ibis/config.py Options/Repr/Interactive).

``ibis_spark.options`` mirrors the reference's settings surface; the
load-bearing ones are ``interactive`` (rich preview reprs — bounded
fetches, never full collects) and ``default_backend`` (consulted by
``get_backend``). The rest are accepted so reference code that sets them
keeps working.
"""

from __future__ import annotations

from typing import Any, Callable, Optional


class Interactive:
    """Options controlling the interactive repr (config.py:51)."""

    __slots__ = ("max_rows", "max_columns", "max_length", "max_string", "show_types")

    def __init__(self):
        self.max_rows: int = 10
        self.max_columns: Optional[int] = 0
        self.max_length: int = 2
        self.max_string: int = 80
        self.show_types: bool = True


class Repr:
    """Options controlling expression printing (config.py:81)."""

    __slots__ = ("interactive", "depth", "table_columns")

    def __init__(self):
        self.interactive = Interactive()
        self.depth: Optional[int] = None
        self.table_columns: Optional[int] = None


class Options:
    """Top-level options (config.py:113)."""

    __slots__ = (
        "interactive",
        "repr",
        "verbose",
        "verbose_log",
        "graphviz_repr",
        "default_backend",
        "pyspark",
    )

    def __init__(self):
        self.interactive: bool = False
        self.repr = Repr()
        self.verbose: bool = False
        self.verbose_log: Optional[Callable] = None
        self.graphviz_repr: bool = False
        self.default_backend: Optional[Any] = None
        self.pyspark: Optional[Any] = None


options = Options()
