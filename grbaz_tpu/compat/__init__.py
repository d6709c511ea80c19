"""Compatibility bridges to external tools and legacy APIs.

Equivalents of the reference's long-tail integration modules:
``python/baudline.py`` (external analyzer bridge), ``python/
horizons_block.py`` (ephemeris-driven doppler tuning) and the legacy
``usrp.*`` API shim (``python/usrp.py`` + ``python/usrp/``).
"""
