"""Framework exceptions (parity: dance/exceptions.py:1-2)."""


class DevError(Exception):
    """Internal invariant violation — indicates a framework bug, not a user error."""
