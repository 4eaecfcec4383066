"""Property tests: the trie-factored phrase pattern is match-equivalent
to the longest-first flat alternation it replaced (extract.py)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from session_graph_spark.operators.extract import _PHRASES, _trie_pattern

_WORDS = st.sampled_from(
    [w for p in _PHRASES for w in p.split()]
    + ["alpha", "beta", "js", "node", "docker", "api", "x", "a1"]
)


def _flat(phrases):
    return re.compile(
        r"(?<![\w.])("
        + "|".join(re.escape(p) for p in sorted(phrases, key=len, reverse=True))
        + r")(?!\w)"
    )


def _trie(phrases):
    return re.compile(r"(?<![\w.])(" + _trie_pattern(list(phrases)) + r")(?!\w)")


@settings(max_examples=300, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=30),
       st.sampled_from([" ", ".", " . ", ", "]))
def test_trie_equals_flat_on_full_gazetteer(words, sep):
    text = sep.join(words)
    assert _flat(_PHRASES).findall(text) == _trie(_PHRASES).findall(text)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.text(alphabet="ab .", min_size=1, max_size=8), min_size=1,
               max_size=12))
def test_trie_equals_flat_on_random_dictionaries(phrases):
    """Arbitrary small dictionaries over a tiny alphabet (prefix-heavy by
    construction — the hard case for trie factoring)."""
    phrases = {p.strip() for p in phrases if p.strip()}
    if not phrases:
        return
    flat, trie = _flat(phrases), _trie(phrases)
    probes = [" ".join(phrases), ".".join(phrases), "x".join(phrases),
              "a ab aab b ba . a.b"]
    for t in probes:
        assert flat.findall(t) == trie.findall(t), (sorted(phrases), t)
