"""User-defined document properties (PropertyNames family).

The reference stores meta content / scoped element text as retrievable,
sortable, range-limitable per-document properties (metaEntry METp
entries, /root/reference/src/docprop.c; directive parse
/root/reference/src/parse_conffile.c:709-1008). This module is the
shared value pipeline used by BOTH the Spark builder and the
pure-Python oracle, so engine==oracle property identity holds by
construction.

Capture/encode semantics verified against the compiled binary
(swish-e 2.5.8, probes pinned in tests/test_properties_user.py):

- capture unit = one text-buffer flush (meta ``content=`` value, or
  the text between tag boundaries inside an open property element);
  each captured chunk is trimmed of leading/trailing whitespace and
  non-empty chunks join with a SINGLE space (``append_property``
  separates by one space, docprop.c:917-976; the buffer flush skips
  leading whitespace, parser.c:1612-1616) — interior whitespace runs
  inside one chunk are preserved (binary: content "  Two   Spaces  "
  stores "Two   Spaces"),
- string encoding replaces control chars (< 0x20) with a single
  collapsed space unless PropertyNamesNoStripChars
  (EncodeProperty, docprop.c:817-845),
- PropertyNamesMaxLength caps the stored byte length (binary: max 3
  over "Mango" stores "Man"),
- numeric/date values must be ENTIRELY base-10 digits after optional
  leading whitespace (strtoul + trailing-garbage check,
  docprop.c:780-800: "2004-07-01" warns and drops); dates are unix
  epochs, displayed as ``%Y-%m-%d %H:%M:%S UTC``,
- a second value for a numeric/date property is dropped with a
  warning — only STRING properties append (addDocProperty,
  docprop.c:1075-1090),
- default string sort/compare is ASCII-case-insensitive
  (META_IGNORE_CASE set by PropertyNames, parse_conffile.c:718;
  binary sort: apple < Mango < ZEBRA); PropertyNamesCompareCase
  clears it (binary sort: Man < ZEB < app);
  PropertyNamesSortKeyLength compares a prefix only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# built-in docs-table columns; user property columns are prefixed to
# keep the namespace separate (the reference keeps swishtitle etc. as
# reserved metaIDs, /root/reference/src/metanames.c:62-110)
PROP_COL_PREFIX = "prop_"

_CTRL_RE = re.compile(r"[\x00-\x1f]+")
_UC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LC = "abcdefghijklmnopqrstuvwxyz"
_FOLD = str.maketrans(_UC, _LC)


@dataclass(frozen=True)
class PropSpec:
    """One declared property (metaEntry with META_PROP)."""

    name: str
    kind: str = "string"        # string | int | date
    ignore_case: bool = True    # META_IGNORE_CASE (string sort/compare)
    nostrip: bool = False       # META_NOSTRIP (keep control chars)
    max_len: int | None = None  # PropertyNamesMaxLength
    sort_len: int | None = None  # PropertyNamesSortKeyLength
    use_strcoll: bool = False   # META_USE_STRCOLL; strcoll == strcmp
    #                             in the C locale this engine pins, so
    #                             it behaves like CompareCase here

    def to_tuple(self):
        return (self.name, self.kind, self.ignore_case, self.nostrip,
                self.max_len, self.sort_len, self.use_strcoll)

    @property
    def column(self) -> str:
        return PROP_COL_PREFIX + self.name

    @property
    def spark_type(self) -> str:
        return "string" if self.kind == "string" else "long"


def spec_of(t) -> PropSpec:
    """Manifest round-trip: tuples become lists through JSON."""
    if isinstance(t, PropSpec):
        return t
    name, kind, ic, ns, ml, sl, uc = t
    return PropSpec(str(name), str(kind), bool(ic), bool(ns),
                    None if ml is None else int(ml),
                    None if sl is None else int(sl), bool(uc))


def specs_of(cfg_properties) -> dict[str, PropSpec]:
    return {s.name: s for s in map(spec_of, cfg_properties or ())}


def parse_number(raw: str):
    """strtoul-with-trailing-garbage-check (EncodeProperty,
    /root/reference/src/docprop.c:780-800): optional leading
    whitespace, then base-10 digits to the END of the string, else the
    property is dropped (None)."""
    s = raw.lstrip()
    if s.startswith("+"):  # strtoul accepts a leading '+'
        s = s[1:]
    if not s or not s.isascii() or not s.isdigit():
        return None
    return int(s)


def finalize(spec: PropSpec, chunks) -> int | str | None:
    """Captured raw chunks → the stored property value (or None)."""
    if not chunks:
        return None
    if spec.kind in ("int", "date"):
        # numeric/date: first value wins, duplicates are dropped
        # (addDocProperty warns "Attempt to add duplicate property",
        # docprop.c:1085-1090)
        for c in chunks:
            v = parse_number(c)
            if v is not None:
                return v
            # a malformed first value is DROPPED with a warning and
            # the next add creates the property (error path returns
            # NULL so propEntry stays unset)
        return None
    val = ""
    ml = spec.max_len
    for c in chunks:
        p = c.strip()
        if not p:
            continue
        if not spec.nostrip:
            # control chars collapse to one space (EncodeProperty
            # strip loop, docprop.c:823-845) — the space-dedup only
            # spans the control-char run itself
            p = _CTRL_RE.sub(" ", p)
        if not val:
            val = p if ml is None else p[:ml]
            continue
        # append_property (docprop.c:927-976): one-space delimiter
        # unless either side already has whitespace at the junction;
        # a full property SKIPS the chunk entirely (binary: max 6 over
        # Mango+apple stores "Mango", never "Mango "), a partly-full
        # one keeps the head (max 7 → "Mango a")
        add = 0 if (val[-1].isspace() or p[0].isspace()) else 1
        if ml is not None:
            if len(val) + add >= ml:
                continue
            p = p[:ml - len(val) - add]
        val += (" " if add else "") + p
    return val if val else None


def finalize_all(prop_chunks: dict, specs: dict[str, PropSpec]) -> dict:
    """doc.prop_chunks → {column_name: value} for the docs table."""
    out = {}
    for name, spec in specs.items():
        v = finalize(spec, prop_chunks.get(name, ()))
        if v is not None:
            out[spec.column] = v
    return out


def sort_key(spec: PropSpec, value):
    """Python-side sort key honoring IgnoreCase / SortKeyLength.
    Missing values sort BEFORE present ones
    (/root/reference/src/docprop.c:1139-1147)."""
    if value is None:
        return (0, "")
    if spec.kind != "string":
        return (1, value)
    v = value
    if spec.sort_len is not None:
        v = v[:spec.sort_len]
    if spec.ignore_case:
        v = v.translate(_FOLD)
    return (1, v)


def sort_col(spec: PropSpec, col):
    """pyspark Column sort key with the same semantics."""
    from pyspark.sql import functions as F

    if spec.kind != "string":
        return col
    if spec.sort_len is not None:
        col = F.substring(col, 1, spec.sort_len)
    if spec.ignore_case:
        col = F.translate(col, _UC, _LC)
    return col


def display(spec: PropSpec, value) -> str:
    """-x/<prop> rendering: dates display in the reference's
    DATE_FORMAT_STRING shape '%Y-%m-%d %H:%M:%S %Z' (config.h:148,
    result_output.c:742-753) — DELIBERATE DIVERGENCE: the reference
    renders through localtime() so output depends on $TZ; here dates
    are pinned to UTC so results are byte-identical on any host (the
    engine==oracle==driver-gate contract needs deterministic strings).
    Matches the binary exactly when TZ=UTC."""
    if value is None:
        return ""
    if spec.kind == "date":
        import datetime as _dt

        return _dt.datetime.fromtimestamp(
            int(value), _dt.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S UTC")
    return str(value)


def compare_value_ok(spec: PropSpec, value, lo, hi) -> bool:
    """-L range check for one python value (Compare_Properties,
    /root/reference/src/docprop.c:1139-1200)."""
    if value is None:
        return False
    if spec.kind != "string":
        try:
            return int(lo) <= value <= int(hi)
        except (TypeError, ValueError):
            return False
    if spec.ignore_case:
        return (str(lo).translate(_FOLD) <= value.translate(_FOLD)
                <= str(hi).translate(_FOLD))
    return str(lo) <= value <= str(hi)


def limit_cond_user(spec: PropSpec, lo, hi):
    """pyspark Column for one inclusive -L range on a user property."""
    from pyspark.sql import functions as F

    c = F.col(spec.column)
    if spec.kind != "string":
        return c.between(int(lo), int(hi))
    if spec.ignore_case:
        return F.translate(c, _UC, _LC).between(
            str(lo).translate(_FOLD), str(hi).translate(_FOLD))
    return c.between(str(lo), str(hi))
