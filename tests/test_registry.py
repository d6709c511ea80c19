"""Every registry entry must resolve to a live object (no drift)."""

import pytest

from grbaz_tpu import registry


@pytest.mark.parametrize("name", sorted(registry.REGISTRY))
def test_entry_resolves(name):
    obj = registry.resolve(name)
    assert obj is not None


def test_taxonomy_helpers():
    cats = registry.categories()
    assert "Networking" in cats and "Applications/P25" in cats
    nets = registry.blocks_by_category("Networking")
    assert "udp_source" in nets
    assert registry.find("burst") == ["burst_buffer", "burst_tagger",
                                      "burster", "burster_config"]
    t = registry.tree()
    assert "[grbaz_tpu]" in t and "fractional_resampler" in t
