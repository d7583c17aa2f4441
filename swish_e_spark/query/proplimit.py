"""-L property-range semantics shared by the Spark engine and the
pure-Python oracle.

swishtitle carries META_IGNORE_CASE by default
(/root/reference/src/metanames.c:88), so range compares on it use
strncasecmp — an ASCII case fold in the C locale
(Compare_Properties, /root/reference/src/docprop.c:1168-1177).
docpath and user properties compare exact. Pinned by
tests/test_refbin.py against the compiled binary's -L output.
"""

from __future__ import annotations

IGNORE_CASE_PROPS = frozenset({"title"})
_UC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LC = "abcdefghijklmnopqrstuvwxyz"
_FOLD = str.maketrans(_UC, _LC)


def limit_cond(prop, lo, hi):
    """pyspark Column for one inclusive -L range."""
    from pyspark.sql import functions as F

    c = F.col(prop)
    if prop in IGNORE_CASE_PROPS:
        return F.translate(c, _UC, _LC).between(
            str(lo).translate(_FOLD), str(hi).translate(_FOLD))
    return c.between(lo, hi)


def limit_value_ok(prop, value, lo, hi) -> bool:
    """Oracle-side mirror of limit_cond for plain python values."""
    if value is None:
        return False
    if prop in IGNORE_CASE_PROPS and isinstance(value, str):
        return (str(lo).translate(_FOLD) <= value.translate(_FOLD)
                <= str(hi).translate(_FOLD))
    return lo <= value <= hi
