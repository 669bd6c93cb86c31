"""Property-based tests (hypothesis) for the deletion-vector codec
layer: the 64-bit RoaringBitmapArray portable roundtrip must hold
for ANY sorted unique index set — including the container-type
boundaries (array <= 4096 < bitmap) and multi-key spreads — and the
Z85 codec for any 4-aligned byte string."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from datawarehouseproject_spark.functions.delta_log import (
    _roaring32_deserialize,
    _roaring32_serialize,
    rbm_array_deserialize,
    rbm_array_serialize,
    z85_decode,
    z85_encode,
)


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        min_size=1,
        max_size=300,
    )
)
def test_rbm_array_roundtrip_any_sorted_set(values):
    vals = sorted(values)
    assert rbm_array_deserialize(rbm_array_serialize(vals)) == vals


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=4000, max_value=4200),  # array/bitmap edge
    st.integers(min_value=0, max_value=1 << 16),
)
def test_roaring32_container_boundary(card, offset):
    # shift the low range by the drawn offset (clamped so the run
    # stays inside the 16-bit container) — review pass 3: the offset
    # axis was drawn but unused, so shifted ranges went untested
    base_low = min(offset, (1 << 16) - card)
    lows = list(range(base_low, base_low + card))
    blob = _roaring32_serialize([(2, lows, False)])
    vals, pos = _roaring32_deserialize(blob, 0)
    assert vals == [(2 << 16) | v for v in lows]
    assert pos == len(blob)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400).map(
    lambda b: b + b"\x00" * ((-len(b)) % 4)
))
def test_z85_roundtrip_any_aligned_bytes(data):
    assert z85_decode(z85_encode(data)) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=8, max_size=200))
def test_rbm_deserialize_never_escapes_valueerror(data):
    """Arbitrary bytes into the deserializer: succeed or ValueError,
    nothing else (the quarantine contract at the unit level)."""
    try:
        rbm_array_deserialize(bytes(data))
    except ValueError:
        pass
