"""Scalar column-expression layer (SURVEY.md §2.9).

Every reference scalar (F1 unit conversion, F2 epoch→local timestamp,
F3 coercing timestamp parse, F5 JSON decode) compiles to pure Catalyst
column expressions — no Python UDFs in the hot path. The extension
modules (text/vectors) also stay expression-first and drop to Pandas
UDFs only where noted.
"""

from .weather import kelvin_to_fahrenheit, local_timestamp, to_timestamp_coerce
from . import text, vectors

__all__ = [
    "kelvin_to_fahrenheit",
    "local_timestamp",
    "to_timestamp_coerce",
    "text",
    "vectors",
]
