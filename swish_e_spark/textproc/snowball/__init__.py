"""Pure-Python Snowball stemmers for the reference's 15 language
modes (fuzzy_opts dispatch, /root/reference/src/stemmer.c:117-141;
generated algorithm sources /root/reference/src/snowball/stem_*.c).

The algorithms are Martin Porter's public Snowball algorithms
(snowballstem.org); each implementation here is written from the
published algorithm description and pinned byte-for-byte to the
REFERENCE's vintage of the generated code by the committed fixtures
(tests/fixtures/snowball_*.tsv, produced by running the reference
stemmers as oracles).

Language codes mirror the reference mode suffixes: de dk en1 en2 es
fi fr hu it nl no pt ro ru se ("en1" is the Snowball rendering of
the 1980 Porter algorithm, which differs from textbook Porter on
edge cases and has its own module).

Input/output are lowercase unicode strings; accented characters are
the Latin-1 repertoire the reference operates on (Cyrillic for ru,
ISO-8859-2 extras for ro).
"""

from __future__ import annotations

_LANGS = ("de", "dk", "en1", "en2", "es", "fi", "fr", "hu", "it",
          "nl", "no", "pt", "ro", "ru", "se")


def snowball_fn(lang: str):
    """Per-token stem function for ``snowball_<lang>`` fuzzy modes."""
    if lang not in _LANGS:
        raise ValueError(f"unknown snowball language {lang!r} "
                         f"(available: {', '.join(_LANGS)})")
    import importlib

    mod = importlib.import_module(f".{lang}", __name__)
    return mod.stem
