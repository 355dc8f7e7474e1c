"""Expression utilities.

``let(col, fn)`` — bind an expensive expression to a lambda variable so it is
evaluated ONCE even when referenced many times. Catalyst's CollapseProject
duplicates expressions across projection boundaries, and higher-order
functions run interpreted with no common-subexpression elimination — so an
expensive array expression referenced k times costs k evaluations. Lambda
variables, by contrast, are bound values: wrapping the expression in a
single-element array and transforming it turns the lambda into a let-binding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once, then apply ``fn`` to the bound value."""
    return F.element_at(F.transform(F.array(col), fn), 1)
