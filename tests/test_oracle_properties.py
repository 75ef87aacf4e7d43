"""Property-based oracle tests (hypothesis): invariants that must hold
for ARBITRARY input, not just the ported fixtures."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from deidentify_spark.oracle import Deidentifier

D = Deidentifier("prop-key")
D2 = Deidentifier("prop-key")

# Text-ish alphabet incl. PII-triggering characters and some unicode.
_ALPHA = string.ascii_letters + string.digits + " \n\t.,:;@()+-#…é漢"
texts = st.text(alphabet=_ALPHA, max_size=400)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_text_never_crashes_and_is_deterministic(s):
    out1 = D.text(s)
    out2 = D2.text(s)
    assert out1 == out2
    assert isinstance(out1, str)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_gating_equivalence_random(s):
    """The digit/'@' fast-path gates must be no-ops on arbitrary input."""
    ungated = s
    if ungated != "":
        r = ungated
        r = D._process_emails(r)
        r = D._process_phones(r)
        r = D._process_ssns(r, ungated)
        r = D._process_credit_cards(r)
        r = D._process_context_addresses(r)
        r = D._process_special_addresses(r)
        r = D._process_names(r)
        r = D._process_standard_addresses(r)
        expected = r
    else:
        expected = ""
    assert D.text(s) == expected


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.digits + "()+-. ", min_size=1, max_size=30))
def test_phone_generator_total(s):
    """generate_phone never crashes on arbitrary digit-ish strings and is
    deterministic (falls back to generic for non-matching formats)."""
    assert D.generate_phone(s) == D2.generate_phone(s)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_ALPHA, min_size=1, max_size=60))
def test_generators_nonempty_and_typed(s):
    assert D.generate_email(s).count("@") == 1
    name = D.generate_name(s)
    assert " " in name
    card = D.generate_credit_card(s).replace(" ", "")
    assert len(card) == 16 and card.startswith("4000")
    ssn = D.generate_ssn(s)
    a, b, c = ssn.split("-")
    assert 100 <= int(a) <= 665 and int(a) != 666
    assert 1 <= int(b) <= 99 and 1 <= int(c) <= 9999


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet=_ALPHA, max_size=30), min_size=2, max_size=2),
        max_size=12,
    )
)
def test_slices_shape_preserved(rows):
    out = D.slices(rows)
    assert len(out) == len(rows)
    for orig, new in zip(rows, out):
        assert len(new) == len(orig)
        for o, n in zip(orig, new):
            if o == "":
                assert n == ""
