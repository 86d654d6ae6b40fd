from . import attention, common, compress, nsa, rotary, selection  # noqa: F401
