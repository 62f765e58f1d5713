from . import kpis, validate  # noqa: F401
