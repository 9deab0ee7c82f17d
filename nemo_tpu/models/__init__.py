"""Physical models: cosmology, GNFW profiles, beams, SZ spectra, signals."""

from . import beams, cosmology, gnfw, profiles, sz  # noqa: F401
