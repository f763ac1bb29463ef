"""Operator library. Importing a module registers its queries."""

from __future__ import annotations

import importlib

_MODULES = (
    "ctr",
    "tpch",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "scalars",
    "udfs",
    "asof",
    "merge",
    "textops",
    "dedup",
    "similarity",
    "retrieval",
    "multimodal",
    "timeseries",
    "graph",
    "layout",
    "sqltext",
    "evals",
)


def load_all() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(f"hadoopmapreduce_spark.operators.{mod}")
        except ModuleNotFoundError as e:
            # modules land incrementally across build waves
            if f"operators.{mod}" not in str(e):
                raise
    # streaming registers a batch-checkable query too
    try:
        importlib.import_module("hadoopmapreduce_spark.streaming.windowed")
    except ModuleNotFoundError:
        pass
