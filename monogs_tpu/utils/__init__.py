from .logging import Log  # noqa: F401
