"""Default English stopword list.

The reference ships no default stoplist (stopwords come from config:
``IgnoreWords`` parsed in /root/reference/src/parse_conffile.c); its test
config uses a small explicit set. We keep a compact, explicit default so
results are deterministic and the oracle/engine share one source of truth.
"""

DEFAULT_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)
