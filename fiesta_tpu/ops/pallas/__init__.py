from . import edt  # noqa: F401
