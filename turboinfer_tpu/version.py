"""Version information for turboinfer-tpu.

Mirrors the reference facade's Version struct (reference:
include/turboinfer/turboinfer.hpp:40-45) but as plain module constants.
"""

MAJOR = 0
MINOR = 1
PATCH = 0

__version__ = f"{MAJOR}.{MINOR}.{PATCH}"


def version_string() -> str:
    return __version__
