from . import extract, native, search, suffix_array  # noqa: F401
