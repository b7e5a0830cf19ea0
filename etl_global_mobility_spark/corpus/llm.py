"""placeholder — filled in incrementally."""

SPECS: list = []
