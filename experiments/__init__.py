"""Non-shipping experiments: measured negative results kept for the record.

Nothing in here is imported by the framework. Each module documents a
candidate optimization that hardware profiling rejected, with the
numbers that rejected it (see each module's docstring and PARITY.md).
"""
