from . import fields, polymesh  # noqa: F401
