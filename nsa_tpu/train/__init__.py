from . import data, pretrain  # noqa: F401
