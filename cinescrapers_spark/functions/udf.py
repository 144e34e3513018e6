"""Lazy pandas-UDF wrapper.

pyspark 4.x parses the UDF return type via the active SparkSession, so
decorating at import time fails without one. ``lazy_pandas_udf`` defers the
wrap until the first call (by which point a session exists) and memoizes it.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql.functions import pandas_udf


def lazy_pandas_udf(return_type: str) -> Callable:
    def deco(fn: Callable) -> Callable:
        holder: dict = {}

        def col_fn(*cols):
            if "udf" not in holder:
                holder["udf"] = pandas_udf(fn, return_type)
            return holder["udf"](*cols)

        col_fn.__name__ = fn.__name__
        col_fn.__doc__ = fn.__doc__
        col_fn.__wrapped__ = fn
        return col_fn

    return deco
