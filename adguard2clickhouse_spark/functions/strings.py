"""String/array scalar functions (SURVEY.md §2.6 O1-O4).

ClickHouse originals appear in the tld_stats MV
(/root/reference/README.md:145-148): the TLD of a hostname is computed
as ``arrayRotateRight(splitByChar('.', QH), 1)[1]`` — rotate-right then
first element, i.e. simply the LAST dot-segment. We implement both the
literal composition (for parity) and the direct ``element_at(arr, -1)``
rewrite (what a Spark-first plan should run).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def split_by_char(col: Column | str, ch: str = ".") -> Column:
    """``splitByChar(ch, s)`` (README.md:145): literal-char split.

    Spark ``split`` is regex-based, so the char is escaped. Matches
    ClickHouse on empty strings (both yield ``['']``).
    """
    import re

    return F.split(_c(col), re.escape(ch))


def array_rotate_right(col: Column | str, n: int = 1) -> Column:
    """``arrayRotateRight(arr, n)`` (README.md:145).

    Composed from slice/concat — no Spark builtin. The engine never
    executes this in the tld path (see ``tld``); it exists for function
    parity and tests.
    """
    arr = _c(col)
    sz = F.size(arr)
    k = F.lit(n) % sz
    return F.when(sz == 0, arr).otherwise(
        F.when(k == 0, arr).otherwise(
            F.concat(F.slice(arr, sz - k + 1, k), F.slice(arr, 1, sz - k))
        )
    )


def tld(col: Column | str) -> Column:
    """Last dot-segment of a hostname.

    Reference computes ``arrayRotateRight(splitByChar('.',QH),1)[1]``
    (README.md:145); rotate-right-then-head ≡ last element, so the
    Spark-first plan is a single ``substring_index(s, '.', -1)`` —
    stays in codegen with NO regex split and NO array alloc per row
    (≡ element_at(split,-1): text after the last dot, the whole
    string when dot-free, '' on a trailing dot — identical in both
    engines).
    """
    return F.substring_index(_c(col), ".", -1)
