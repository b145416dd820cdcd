"""Property-based checks for the parity-critical primitives.

The line cleaner and the integer-cents pattern carry the correctness
story (golden parity, oracle hash-exactness); hypothesis hammers the
edge cases fixtures can't enumerate.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from boat_etl_pyspark_spark.pipeline.boat import _clean_line

text_strategy = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=200,
)


@settings(max_examples=500, deadline=None)
@given(text_strategy)
def test_clean_line_invariants(s):
    out = _clean_line(s)
    # ASCII-only output
    assert all(ord(c) < 128 for c in out)
    # the recursive collapse terminated: no doubled spaces survive
    assert "  " not in out
    # stripped ends
    assert out == out.strip()
    # NOT asserted: idempotence. The reference algorithm's quote fixes
    # are single-pass (only the double-space collapse loops to a
    # fixpoint), so adversarial inputs like '0\xa0"' clean to '0 "'
    # which a second pass would change to '0"'. Hypothesis found this;
    # byte-parity means preserving it, not fixing it.


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                                      exclude_categories=("Cs",)), max_size=80))
def test_clean_line_total(s):
    # never raises, on any unicode input
    out = _clean_line(s)
    assert isinstance(out, str)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.decimals(min_value=-10**9, max_value=10**9, places=2),
                min_size=1, max_size=50))
def test_cents_pattern_is_exact_and_order_free(values):
    """Summing 2-decimal money via scaled integers equals the exact
    decimal sum, independent of order — the claim behind money_sum."""
    import decimal
    import random

    floats = [float(v) for v in values]
    exact = sum(decimal.Decimal(str(f)) for f in floats)

    def int_sum(fs):
        return sum(int(round(f * 100)) for f in fs)

    a = int_sum(floats)
    shuffled = floats[:]
    random.Random(42).shuffle(shuffled)
    b = int_sum(shuffled)
    assert a == b  # order-free
    assert decimal.Decimal(a) / 100 == exact  # exact vs decimal arithmetic
