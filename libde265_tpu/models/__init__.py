"""Profile/level capability descriptors (the codec analogue of model configs).

The reference's capability surface is the HEVC Main profile family
(/root/reference/README.md:7-15: Main, plus much of Main10 and the range
extensions).  These descriptors drive feature gating and stream validation.
"""

from .profiles import (  # noqa: F401
    MAIN,
    MAIN10,
    MAIN_STILL,
    PROFILES,
    Level,
    Profile,
    level_limits,
)
