"""Column-level function library (no DataFrame plumbing)."""

from .wordpiece import wordpiece_pieces  # noqa: F401
from .samplers import (  # noqa: F401
    ELDER_SCROLLS_PARTS,
    FRENCH_PARTS,
    elder_scrolls_name,
    elder_scrolls_name_py,
    french_name,
    french_name_py,
)
