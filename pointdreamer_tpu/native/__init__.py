from . import qem  # noqa: F401
