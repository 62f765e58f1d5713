from .daily_job import run_daily  # noqa: F401
