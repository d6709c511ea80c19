"""The 5-part tutorial examples are self-checking; run them all."""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import tutorial  # noqa: E402


@pytest.mark.parametrize("part", sorted(tutorial.PARTS))
def test_tutorial_part(part):
    res = tutorial.PARTS[part]()
    assert isinstance(res, dict) and res
