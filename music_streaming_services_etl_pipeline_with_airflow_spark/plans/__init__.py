from .registry import QUERIES, ORACLES, register  # noqa: F401
