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


def _specs_by_col(cfg):
    """cfg may be an IndexConfig (``.properties``) or the raw
    PropertyNames spec tuple itself."""
    from ..textproc.docprops import specs_of

    if cfg is None:
        return {}
    props = getattr(cfg, "properties", cfg)
    return {s.column: s for s in specs_of(props or ()).values()}


def limits_cond(limits, cfg=None):
    """AND of every -L range → ONE pyspark Column. Built-in docs
    columns use limit_cond; user-property columns (PropertyNames)
    resolve their PropSpec from the index config so IgnoreCase /
    CompareCase / numeric semantics apply
    (Compare_Properties, /root/reference/src/docprop.c:1139-1200)."""
    from ..textproc.docprops import limit_cond_user

    by_col = _specs_by_col(cfg)
    cond = None
    for prop, (lo, hi) in limits.items():
        spec = by_col.get(prop)
        c = (limit_cond_user(spec, lo, hi) if spec is not None
             else limit_cond(prop, lo, hi))
        cond = c if cond is None else cond & c
    return cond


def limits_value_ok(docprops_row: dict, limits, cfg=None) -> bool:
    """Oracle/python mirror of limits_cond over one doc's props."""
    from ..textproc.docprops import compare_value_ok

    by_col = _specs_by_col(cfg)
    for p, (lo, hi) in limits.items():
        spec = by_col.get(p)
        v = docprops_row.get(p)
        ok = (compare_value_ok(spec, v, lo, hi) if spec is not None
              else limit_value_ok(p, v, lo, hi))
        if not ok:
            return False
    return True
