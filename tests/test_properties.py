"""Property-based tests (hypothesis) over the pure-Python kernels.

These pin structural invariants that hold for ALL inputs — the goldens in
test_normalize.py pin specific reference-parity bytes; these pin the shape
of the output space.  Pure Python only (no Spark session), so the whole
module runs in seconds.
"""

import string

from hypothesis import given, settings, strategies as st

from lab02_citation_matching_and_entity_resolution_spark.functions.normalize import (
    normalize_text,
)

# full-unicode text, surrogates excluded (not valid in UTF-8 interchange)
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)

DELETED_PUNCT = set(string.punctuation) - {":", "/"}


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_normalize_deterministic(s):
    assert normalize_text(s) == normalize_text(s)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_normalize_output_alphabet(s):
    """Post-conditions by construction: stripped, single-spaced, no deleted
    ASCII punctuation (the translate table runs after every stage that could
    introduce ASCII punct, including NFKD of fullwidth forms)."""
    out = normalize_text(s)
    assert out == out.strip()
    assert "  " not in out
    assert "\t" not in out and "\n" not in out and "\r" not in out
    assert not (set(out) & DELETED_PUNCT)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_normalize_token_edges_flag(s):
    out = normalize_text(s, strip_token_edges=True)
    for tok in out.split(" "):
        if out:
            assert tok, "empty token survived strip_token_edges"
            assert tok == tok.strip(":/")


def test_normalize_is_not_idempotent_by_design():
    """Discovered BY hypothesis, pinned as a golden: the chain lowercases
    BEFORE NFKD (reference operation order, ref src/match_utils.py:138-141),
    so compatibility decompositions can introduce uppercase that a second
    application would fold — '℉' -> '°F' (not '°f').  This is faithful
    reference behavior, NOT a bug to fix; asserting general idempotence
    would mis-pin the engine."""
    assert normalize_text("℉") == "°F"
    assert normalize_text("°F") == "°f"
    assert normalize_text(normalize_text("°F")) == "°f"  # stable at 2nd pass


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_second_application_reaches_fixpoint(s):
    """Weaker-but-true form of idempotence: one extra pass is a fixpoint
    (the only non-idempotence source is NFKD-introduced case, which the
    second pass's lower() folds; the folded text is NFKD-stable)."""
    once = normalize_text(s)
    twice = normalize_text(once)
    assert normalize_text(twice) == twice
