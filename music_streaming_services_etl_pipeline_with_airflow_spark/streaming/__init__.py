from . import hourly_stream  # noqa: F401
