from . import gspmd  # noqa: F401
