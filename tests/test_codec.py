import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from blacklab_spark import codec


def test_varint_roundtrip_basic():
    v = np.array([0, 1, 127, 128, 300, 2**21, 2**42, 2**63 - 1], dtype=np.uint64)
    assert (codec.decode_varints(codec.encode_varints(v)) == v).all()


def test_varint_empty():
    assert codec.encode_varints(np.array([], dtype=np.uint64)) == b""
    assert codec.decode_varints(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_hypothesis(values):
    v = np.array(values, dtype=np.uint64)
    out = codec.decode_varints(codec.encode_varints(v))
    assert (out == v).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=100, unique=True))
def test_delta_roundtrip(values):
    v = np.array(sorted(values), dtype=np.uint64)
    out = codec.decode_deltas(codec.encode_deltas(v))
    assert (out == v).all()


def test_positions_roundtrip():
    lists = [np.array([0, 3, 7], dtype=np.uint64),
             np.array([], dtype=np.uint64),
             np.array([5], dtype=np.uint64),
             np.array([1, 2, 3, 100], dtype=np.uint64)]
    buf = codec.encode_positions(lists)
    out = codec.decode_positions(buf, len(lists))
    assert len(out) == 4
    for a, b in zip(lists, out):
        assert (a == b).all()


def test_varint_compactness():
    # small gaps encode to 1 byte each — the point of delta-gap
    v = np.arange(1000, 2000, dtype=np.uint64)
    assert len(codec.encode_deltas(v)) <= 2 + 999  # first abs ≤2B + 1B gaps
