from .lake import load_testdata, read_table  # noqa: F401
